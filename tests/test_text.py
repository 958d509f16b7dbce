"""Tokenizer, pinyin normalization, split tool, and CER tests.

Mirrors the reference's notebook-guided acceptance checks (1.ipynb tokenizer
round-trip; 3_v2.ipynb CER DP) as real unit tests.
"""

import os

from tpuasr.data.bznsyp import normalize_pinyin, parse_prosody_labeling, split_dataset
from tpuasr.text import CharTokenizer, Tokenizer, cer_details, corpus_cer
from tpuasr.text.tokenizer import BLK, EOS, PAD, SOS, SPECIAL_TOKENS, UNK


def test_special_token_ids():
    tok = Tokenizer()
    assert tok.special_token_ids() == [0, 1, 2, 3, 4, 5]
    assert (tok.pad_id, tok.sos_id, tok.eos_id, tok.blk_id) == (PAD, SOS, EOS, BLK)
    assert tok.decode([SOS, 10, EOS]) == [tok.id2token[10]]


def test_roundtrip_and_unk():
    tok = Tokenizer(tokens=["ni", "hao", "ma"])
    ids = tok(["<sos>", "ni", "hao", "zzz", "<eos>"])
    assert ids[0] == SOS and ids[-1] == EOS
    assert ids[3] == UNK
    assert tok.decode(ids) == ["ni", "hao"]
    assert tok.size == len(SPECIAL_TOKENS) + 3


def test_builtin_pinyin_vocab_covers_common_syllables():
    tok = Tokenizer()
    for s in ["zhong", "guo", "ren", "er", "lv", "nv", "xiong", "shuang", "pi"]:
        assert tok.token2id[s] > BLK, s
    assert tok.size > 400


def test_char_tokenizer_keeps_bracketed():
    tok = CharTokenizer(tokens=["你", "好", "<noise>"])
    assert tok.tokenize_text("你 好<noise>") == ["你", "好", "<noise>"]


def test_normalize_pinyin_rules():
    # tones stripped; erhua r -> base + er; IY dropped; P -> pi
    assert normalize_pinyin("ni3 hao3") == ["ni", "hao"]
    assert normalize_pinyin("huar4") == ["hua", "er"]
    assert normalize_pinyin("er2") == ["er"]
    assert normalize_pinyin("IY P ma1") == ["pi", "ma"]


def test_split_dataset(tmp_path):
    transcript = tmp_path / "labels.txt"
    lines = []
    for i in [1, 7999, 8000, 8001, 9000, 9001, 10000]:
        utt = f"{i:06d}"
        lines.append(f"{utt}\t某句话")
        lines.append("mou3 ju4 hua4")
    transcript.write_text("\n".join(lines), encoding="utf-8")
    counts = split_dataset(str(transcript), str(tmp_path / "split"))
    assert counts == {"train": 3, "dev": 2, "test": 2}
    scp = (tmp_path / "split/train/wav.scp").read_text().strip().splitlines()
    assert scp[0].startswith("000001\tWave/000001.wav")
    pinyin = (tmp_path / "split/dev/pinyin").read_text().strip().splitlines()
    assert pinyin[0].split("\t")[1] == "mou ju hua"
    parsed = parse_prosody_labeling(str(transcript))
    assert parsed["000001"]["pinyin"] == ["mou", "ju", "hua"]


def test_cer_counts():
    c = cer_details(list("abcde"), list("abde"))
    assert (c.substitutions, c.deletions, c.insertions) == (0, 1, 0)
    c = cer_details(list("abc"), list("axc"))
    assert (c.substitutions, c.deletions, c.insertions) == (1, 0, 0)
    c = cer_details(list("abc"), list("abxc"))
    assert (c.substitutions, c.deletions, c.insertions) == (0, 0, 1)
    assert cer_details([], list("ab")).errors == 2
    assert cer_details(list("ab"), []).errors == 2


def test_corpus_cer_aggregation():
    total = corpus_cer([(list("abcd"), list("abcd")), (list("abcd"), list("abcx"))])
    assert total.ref_len == 8
    assert total.errors == 1
    assert abs(total.cer - 1 / 8) < 1e-9
