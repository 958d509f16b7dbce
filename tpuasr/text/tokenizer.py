"""Tokenizers.

Contract parity with the reference pinyin tokenizer (tokenizer/tokenizer.py:1-61):
six special tokens ``<pad> <unk> <sos> <eos> " " <blk>`` occupy ids 0-5, the
vocabulary follows; encoding maps unknown tokens to ``<unk>``; decoding skips
specials. `CharTokenizer` mirrors wenet/text/char_tokenizer.py behavior for
character-level Mandarin.
"""

from __future__ import annotations

from typing import Iterable, Sequence

SPECIAL_TOKENS = ("<pad>", "<unk>", "<sos>", "<eos>", " ", "<blk>")

PAD, UNK, SOS, EOS, SPACE, BLK = range(6)


class Tokenizer:
    """Vocabulary-file tokenizer over whitespace-split symbol sequences."""

    def __init__(self, vocab_file: str | None = None, tokens: Iterable[str] | None = None):
        self.token2id: dict[str, int] = {}
        self.id2token: dict[int, str] = {}
        for tok in SPECIAL_TOKENS:
            self._add(tok)
        if vocab_file is not None:
            with open(vocab_file, encoding="utf-8") as f:
                for line in f:
                    tok = line.strip()
                    if tok:
                        self._add(tok)
        elif tokens is not None:
            for tok in tokens:
                self._add(tok)
        else:
            from tpuasr.text.pinyin import PINYIN_SYLLABLES

            for tok in PINYIN_SYLLABLES:
                self._add(tok)

    def _add(self, tok: str) -> None:
        if tok not in self.token2id:
            i = len(self.token2id)
            self.token2id[tok] = i
            self.id2token[i] = tok

    def __call__(self, tokens: Sequence[str]) -> list[int]:
        unk = self.token2id["<unk>"]
        return [self.token2id.get(t, unk) for t in tokens]

    def encode(self, tokens: Sequence[str]) -> list[int]:
        return self(tokens)

    def decode(self, ids: Iterable[int], ignore_special: bool = True) -> list[str]:
        out = []
        for i in ids:
            tok = self.id2token.get(int(i))
            if tok is None:
                if not ignore_special:
                    out.append("<unk>")
                continue
            if ignore_special and tok in SPECIAL_TOKENS:
                continue
            out.append(tok)
        return out

    def special_token_ids(self) -> list[int]:
        return [self.token2id[t] for t in SPECIAL_TOKENS]

    @property
    def size(self) -> int:
        return len(self.token2id)

    @property
    def pad_id(self) -> int:
        return PAD

    @property
    def sos_id(self) -> int:
        return SOS

    @property
    def eos_id(self) -> int:
        return EOS

    @property
    def blk_id(self) -> int:
        return BLK


class CharTokenizer(Tokenizer):
    """Character-level tokenizer: splits raw text into characters, keeping
    ``<...>`` bracketed symbols intact (wenet/text/char_tokenizer.py parity)."""

    def tokenize_text(self, text: str) -> list[str]:
        parts: list[str] = []
        i = 0
        while i < len(text):
            if text[i] == "<":
                j = text.find(">", i)
                if j != -1:
                    parts.append(text[i : j + 1])
                    i = j + 1
                    continue
            if not text[i].isspace():
                parts.append(text[i])
            i += 1
        return parts

    def encode_text(self, text: str) -> list[int]:
        return self(self.tokenize_text(text))
