"""Long-tail parity tests: context-graph hotword biasing, checkpoint
averaging, partial init, extended tokenizers."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuasr.decode.context_graph import build_context_graph
from tpuasr.decode.ctc_prefix_beam import ctc_prefix_beam_search
from tpuasr.train.average import average_params, load_partial


def test_context_graph_scores():
    cg = build_context_graph([[3, 4]], vocab_size=6, context_score=2.0)
    # root --3--> partial(+2) --4--> complete(+2, banked, back to root)
    s = 0
    total = 0.0
    for tok in [3, 4]:
        total += float(cg.score_delta[s, tok])
        s = int(cg.next_state[s, tok])
    assert total == 4.0
    assert s == 0  # banked, back at root
    # partial then mismatch retracts
    s = int(cg.next_state[0, 3])
    total = float(cg.score_delta[0, 3])
    total += float(cg.score_delta[s, 5])
    s2 = int(cg.next_state[s, 5])
    assert total == 0.0 and s2 == 0
    # finalize removes dangling partial bonus
    assert float(cg.finalize_score[s]) == -2.0


def test_context_graph_overlap():
    cg = build_context_graph([[1, 2], [2, 1]], vocab_size=4, context_score=1.0)
    s, total = 0, 0.0
    for tok in [1, 2, 1]:  # "121" contains 12 and 21
        total += float(cg.score_delta[s, tok])
        s = int(cg.next_state[s, tok])
    total += float(cg.finalize_score[s])
    assert total == 4.0


def test_prefix_beam_hotword_boost(rng):
    """A hotword bias must be able to flip the top hypothesis."""
    b, t, v, blank = 1, 6, 6, 0
    # two near-equal paths: token 2 slightly better than token 3
    lp = np.full((b, t, v), -8.0, np.float32)
    lp[0, :, blank] = -0.05
    lp[0, 2, blank] = -8.0  # frame 2 must emit: 2 slightly beats 3
    lp[0, 2, 2] = -0.4
    lp[0, 2, 3] = -0.6
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(lp), -1))
    lens = np.array([t], np.int32)

    base_tok, base_len, _ = ctc_prefix_beam_search(jnp.asarray(lp), lens, blank, 4, 8)
    assert list(np.asarray(base_tok[0, : int(base_len[0])])) == [2]

    cg = build_context_graph([[3]], vocab_size=v, context_score=3.0)
    tok, ln, _ = ctc_prefix_beam_search(jnp.asarray(lp), lens, blank, 4, 8,
                                        context_graph=cg)
    assert list(np.asarray(tok[0, : int(ln[0])])) == [3]


def test_average_params():
    a = {"x": np.ones((2, 2), np.float32), "y": np.full((3,), 2.0, np.float32)}
    b = {"x": np.full((2, 2), 3.0, np.float32), "y": np.zeros((3,), np.float32)}
    avg = average_params([a, b])
    np.testing.assert_allclose(avg["x"], 2.0)
    np.testing.assert_allclose(avg["y"], 1.0)


def test_load_partial():
    params = {"params": {"encoder": {"w": np.zeros(3, np.float32)},
                         "head": {"w": np.zeros(2, np.float32)}}}
    src = {"params": {"encoder": {"w": np.ones(3, np.float32)},
                      "head": {"w": np.ones(2, np.float32)}}}
    out, copied = load_partial(params, src, ["params.encoder"])
    np.testing.assert_allclose(out["params"]["encoder"]["w"], 1.0)
    np.testing.assert_allclose(out["params"]["head"]["w"], 0.0)
    assert copied == ["params.encoder.w"]


def test_paraformer_tokenizer():
    from tpuasr.text.tokenizers_ext import ParaformerTokenizer

    sym = {"<unk>": 0, "ni": 1, "hao": 2, "你": 3, "好": 4}
    tok = ParaformerTokenizer(sym, seg_dict={"nihao": "ni hao"})
    tokens, ids = tok.tokenize("nihao 你好")
    assert tokens == ["ni", "hao", "你", "好"]
    assert ids == [1, 2, 3, 4]
    assert tok.vocab_size() == 5


def test_whisper_tokenizer_roundtrip():
    """Executes offline: the registry encoding needs network, but the
    tokenizer falls back to a merge-free byte-level tiktoken Encoding."""
    from tpuasr.text.tokenizers_ext import WhisperTokenizer

    tok = WhisperTokenizer()
    toks, ids = tok.tokenize("hello world")
    assert len(ids) >= 2 and all(isinstance(i, int) for i in ids)
    out, _ = tok.detokenize(ids)
    assert out == "hello world"
    assert tok.vocab_size() >= 256


def test_pure_bpe_train_and_roundtrip():
    """The BPE path executes with zero external deps: train a tiny model
    in-process, encode/decode round-trips, merges actually fire."""
    from tpuasr.text.tokenizers_ext import PureBpeTokenizer, train_bpe

    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "the dog barks at the quick fox",
        "lazy dogs and quick foxes",
    ] * 5
    model = train_bpe(corpus, vocab_size=60)
    tok = PureBpeTokenizer(model)
    assert tok.vocab_size() <= 60

    text = "the quick dog"
    tokens, ids = tok.tokenize(text)
    assert tokens and len(ids) == len(tokens)
    # frequent words compress below character granularity
    assert len(tokens) < len(text.replace(" ", "")) + text.count(" ") + 1
    back, toks2 = tok.detokenize(ids)
    assert back == text
    assert toks2 == tokens

    # unknown symbols hit <unk>, not a crash
    ids_unk = tok.tokens2ids(["@@nope@@"])
    assert ids_unk == [tok.symbol_table["<unk>"]]

    # JSON round-trip (vendorable model file)
    import json, tempfile, os
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump(model, f)
        path = f.name
    try:
        tok2 = PureBpeTokenizer(path)
        assert tok2.tokenize(text) == tok.tokenize(text)
    finally:
        os.unlink(path)
