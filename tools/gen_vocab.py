#!/usr/bin/env python
"""Build a vocabulary file.

Parity: tokenizer/gen_vocab.py (unique syllables over the split pinyin
files); `--full-pinyin` instead writes the complete standard syllable table
so the framework is usable without the corpus.
"""

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pinyin_files", nargs="*", default=[])
    ap.add_argument("--out", default="tokenizer/vocab.txt")
    ap.add_argument("--full-pinyin", action="store_true")
    args = ap.parse_args()

    import os

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    if args.full_pinyin or not args.pinyin_files:
        from tpuasr.text.pinyin import write_vocab

        write_vocab(args.out)
        print(f"wrote full pinyin table to {args.out}")
        return

    seen = set()
    order = []
    for path in args.pinyin_files:
        with open(path, encoding="utf-8") as f:
            for line in f:
                _, _, toks = line.strip().partition("\t")
                for tok in toks.split(" "):
                    if tok and tok not in seen:
                        seen.add(tok)
                        order.append(tok)
    with open(args.out, "w", encoding="utf-8") as f:
        for tok in sorted(order):
            f.write(tok + "\n")
    print(f"wrote {len(order)} tokens to {args.out}")


if __name__ == "__main__":
    main()
