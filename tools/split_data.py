#!/usr/bin/env python
"""Split the BZNSYP corpus into train/dev/test wav.scp + pinyin files.

Parity: splitdata/split_data.py (ids <= 8000 train, 8001-9000 dev, rest test;
pinyin normalization incl. erhua/IY/P rules).
"""

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--transcript", default="dataset/ProsodyLabeling/000001-010000.txt")
    ap.add_argument("--out_dir", default="dataset/split")
    ap.add_argument("--wav_pattern", default="Wave/{utt}.wav")
    ap.add_argument("--train_max", type=int, default=8000)
    ap.add_argument("--dev_max", type=int, default=9000)
    args = ap.parse_args()

    from tpuasr.data.bznsyp import split_dataset

    counts = split_dataset(
        args.transcript, args.out_dir, args.wav_pattern, args.train_max, args.dev_max
    )
    print(counts)


if __name__ == "__main__":
    main()
