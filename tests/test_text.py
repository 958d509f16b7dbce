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


def test_char_tokenizer_non_lang_syms():
    """wenet/text/char_tokenizer.py:14-56: {xxx}/<xxx>/[xxx] symbols listed in
    non_lang_syms survive as single tokens; unlisted brackets are char-split;
    text is uppercased; spaces become the ▁ word-boundary char."""
    tok = CharTokenizer(
        tokens=["你", "好", "{NOISE}", "[BRK]", "▁", "A", "B"],
        non_lang_syms=["{NOISE}", "[BRK]"],
    )
    assert tok.tokenize_text("你{NOISE}好") == ["你", "{NOISE}", "好"]
    assert tok.tokenize_text("[BRK]你") == ["[BRK]", "你"]
    # unlisted {FOO} is split into characters (wenet behavior)
    assert tok.tokenize_text("{FOO}") == ["{", "F", "O", "O", "}"]
    # inner spaces map to the word-boundary char; text is uppercased
    assert tok.tokenize_text("a b") == ["A", "▁", "B"]


def test_char_tokenizer_non_lang_syms_file(tmp_path):
    p = tmp_path / "nls.txt"
    p.write_text("{NOISE}\n<COUGH>\n", encoding="utf-8")
    tok = CharTokenizer(tokens=["你", "{NOISE}", "<COUGH>"], non_lang_syms=str(p))
    assert tok.non_lang_syms == ["{NOISE}", "<COUGH>"]
    assert tok.tokenize_text("你<COUGH>") == ["你", "<COUGH>"]

    bad = tmp_path / "bad.txt"
    bad.write_text("NOISE\n", encoding="utf-8")
    import pytest

    with pytest.raises(ValueError):
        CharTokenizer(tokens=["你"], non_lang_syms=str(bad))


def test_char_tokenizer_connect_symbol_and_split_with_space():
    """wenet char_tokenizer.py:50-60: split_with_space treats text as
    pre-tokenized on whitespace; connect_symbol joins tokens2text."""
    tok = CharTokenizer(tokens=["NI", "HAO", "{NOISE}"],
                        non_lang_syms=["{NOISE}"],
                        split_with_space=True, connect_symbol=" ")
    assert tok.tokenize_text("ni hao {NOISE}") == ["NI", "HAO", "{NOISE}"]
    assert tok.tokens2text(["NI", "HAO"]) == "NI HAO"
    tok2 = CharTokenizer(tokens=["你", "好"], connect_symbol="")
    assert tok2.tokens2text(["你", "好"]) == "你好"


def test_huggingface_tokenizer_executes(tmp_path, monkeypatch):
    """The HuggingFaceTokenizer wrapper (wenet/text/hugging_face_tokenizer.py
    role) running for real: transformers AutoTokenizer loaded from a local
    BertTokenizer directory (no hub access), full ABC surface."""
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    (tmp_path / "vocab.txt").write_text(
        "[PAD]\n[UNK]\n[CLS]\n[SEP]\n[MASK]\nhello\nworld\nhel\n##lo\n##world\n",
        encoding="utf-8")
    (tmp_path / "tokenizer_config.json").write_text(
        '{"tokenizer_class": "BertTokenizer", "do_lower_case": true}',
        encoding="utf-8")

    from tpuasr.text.tokenizers_ext import HuggingFaceTokenizer

    tok = HuggingFaceTokenizer(str(tmp_path))
    toks = tok.text2tokens("hello world")
    assert toks == ["hello", "world"]
    ids = tok.tokens2ids(toks)
    assert ids == [5, 6]
    assert tok.ids2tokens(ids) == toks
    assert tok.tokens2text(toks) == "hello world"
    assert tok.vocab_size() == 10
    assert tok.symbol_table["##lo"] == 8
    # wordpiece greedy longest-match continuation
    assert tok.text2tokens("helloworld") == ["hello", "##world"]
    # pickling drops the built tokenizer and lazily rebuilds (worker contract)
    import pickle

    tok2 = pickle.loads(pickle.dumps(tok))
    assert tok2.tokenizer is None
    assert tok2.text2tokens("hello") == ["hello"]
