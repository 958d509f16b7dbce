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


def test_ctc_peak_utils():
    from tpuasr.decode.alignment import (
        gen_ctc_peak_time, gen_timestamps_from_peak, replace_duplicates_with_blank,
    )

    # runs of equal non-blank tokens get a separating blank
    assert replace_duplicates_with_blank([1, 1, 2, 0, 0, 3, 3, 3], 0) == \
        [1, 0, 2, 0, 0, 3, 0, 0]
    # peak time = first frame of each non-blank run
    assert gen_ctc_peak_time([0, 1, 1, 0, 2, 3, 3, 0], 0) == [1, 4, 5]
    # timestamps: midpoints between peaks, clamped to half max duration
    times = gen_timestamps_from_peak([2, 10, 30], max_duration=2.0,
                                     frame_rate=0.04, max_token_duration=1.0)
    assert len(times) == 3
    # token 0: start max(0, 2*.04-.5)=0, end min((2+10)/2*.04, 2*.04+.5)=0.24
    assert times[0] == (0.0, 0.24)
    # token 1: start max(0.24, 10*.04-.5)=0.24; end min(0.8, 0.9)=0.8
    assert times[1] == (0.24, 0.8)
    # token 2: start max(0.8, 1.2-0.5)=0.8; end min(2.0, 1.7)=1.7
    assert abs(times[2][0] - 0.8) < 1e-9 and abs(times[2][1] - 1.7) < 1e-9


def test_cif_timestamps_from_peaks():
    from tpuasr.decode.paraformer_beam import cif_timestamps_from_peaks

    # short tail: last token absorbs it
    t = cif_timestamps_from_peaks([5, 10, 20], num_frames=24, frame_rate=0.02)
    assert len(t) == 2
    assert t[0] == (4.5 * 0.02, 9.5 * 0.02)
    assert t[1] == (9.5 * 0.02, 24 * 0.02)  # 24 - 19.5 = 4.5 <= 5
    # long tail: split at the midpoint + trailing silence segment
    t = cif_timestamps_from_peaks([5, 10], num_frames=40, frame_rate=0.02)
    assert len(t) == 2
    mid = (40 + 9.5) * 0.5
    assert t[0] == (4.5 * 0.02, mid * 0.02)
    assert t[1] == (mid * 0.02, 40 * 0.02)
    # gap wider than MAX_TOKEN_DURATION is capped (non-final token; the
    # final token's end is always rewritten by the tail logic)
    t = cif_timestamps_from_peaks([2, 30, 40], num_frames=41, frame_rate=0.02)
    assert abs((t[0][1] - t[0][0]) - 14 * 0.02) < 1e-9


def test_beautify_result():
    from tpuasr.text.beautify import beautify_result

    # all CJK: plain concatenation
    assert beautify_result(["你", "好", "吗"]) == "你好吗"
    # all alpha with @@ BPE continuation: words merge, space-separated
    assert beautify_result(["HE@@", "LLO", "WORLD"]) == "HELLO WORLD"
    # mixed: CJK directly after an English word absorbs the space
    assert beautify_result(["你", "HE@@", "LLO", "好"]) == "你HELLO好"
    # specials are dropped
    assert beautify_result(["<sos>", "你", "<blank>", "好", "<eos>"]) == "你好"


def test_cmvn_wenet_format_loaders(tmp_path):
    import json as _json

    import numpy as np

    from tpuasr.audio.cmvn import load_cmvn_json_stats, load_cmvn_kaldi

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((50, 4)).astype(np.float64) * 3 + 1
    mean_stat = feats.sum(0)
    var_stat = (feats * feats).sum(0)
    n = feats.shape[0]
    want_mean = feats.mean(0)
    want_istd = 1.0 / np.sqrt(feats.var(0))

    jpath = tmp_path / "cmvn.json"
    jpath.write_text(_json.dumps({
        "mean_stat": mean_stat.tolist(), "var_stat": var_stat.tolist(),
        "frame_num": n,
    }))
    mean, istd = load_cmvn_json_stats(str(jpath))
    np.testing.assert_allclose(mean, want_mean, rtol=1e-5)
    np.testing.assert_allclose(istd, want_istd, rtol=1e-4)

    kpath = tmp_path / "cmvn.ark"
    body = " ".join(str(x) for x in mean_stat) + f" {n} " + \
        " ".join(str(x) for x in var_stat) + " 0"
    kpath.write_text(f"[ {body} ]")
    mean, istd = load_cmvn_kaldi(str(kpath))
    np.testing.assert_allclose(mean, want_mean, rtol=1e-5)
    np.testing.assert_allclose(istd, want_istd, rtol=1e-4)


def test_tokenize_mixed_cjk_split():
    from tpuasr.text.tokenizers_ext import ParaformerTokenizer, tokenize_mixed

    # CJK chars split out of a mixed string, non-CJK runs hit the encoder
    got = tokenize_mixed("你好IT'S OK的", lambda run: run.split(), upper=True)
    assert got == ["你", "好", "IT'S", "OK", "的"]

    # ParaformerTokenizer: seg-dict words expand inside mixed text
    sym = {"<unk>": 0, "ni": 1, "hao": 2, "你": 3, "好": 4, "OK": 5}
    tok = ParaformerTokenizer(sym, seg_dict={"nihao": "ni hao"})
    assert tok.text2tokens("你nihao好 OK") == ["你", "ni", "hao", "好", "OK"]


def test_compilation_cache_writes_entries(tmp_path):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuasr.utils.compile_cache import enable_compilation_cache

    td = str(tmp_path / "xla_cache")
    assert enable_compilation_cache(td, min_compile_secs=0.0) == td
    f = jax.jit(lambda x: jnp.sin(x) @ jnp.cos(x).T)
    f(np.ones((64, 64), np.float32)).block_until_ready()
    import os

    files = [fn for _, _, fs in os.walk(td) for fn in fs]
    assert files, "no persistent cache entries written"
