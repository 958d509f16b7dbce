"""RNN-T beam search tests: beam-1 ≡ greedy(1 emission/frame), dedup merge
semantics, and beam quality on a peaked toy distribution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.decode.rnnt_beam import _merge_duplicates, rnnt_beam_decode
from tpuasr.decode.rnnt_greedy import rnnt_greedy_decode

from tests.test_models import small_model_cfg, VOCAB, BLANK
from tpuasr.models import Transducer


@pytest.fixture(scope="module")
def model_and_params():
    cfg = small_model_cfg()
    model = Transducer(cfg)
    feats = np.zeros((2, 67, 80), np.float32)
    params = model.init(
        jax.random.PRNGKey(3), feats, np.array([67, 67], np.int32),
        np.zeros((2, 5), np.int32), np.array([5, 5], np.int32),
    )
    return model, params


def test_beam1_equals_greedy_one_step(model_and_params, rng):
    model, params = model_and_params
    enc = rng.standard_normal((2, 11, 32)).astype(np.float32)
    enc_lens = np.array([11, 7], np.int32)
    g_tok, g_len = rnnt_greedy_decode(
        model, params, jnp.asarray(enc), enc_lens, BLANK, n_steps=1, max_tokens=20
    )
    b_tok, b_len, *_ = rnnt_beam_decode(
        model, params, jnp.asarray(enc), enc_lens, BLANK, beam_size=1, max_tokens=20
    )
    assert list(np.asarray(g_len)) == list(np.asarray(b_len))
    np.testing.assert_array_equal(np.asarray(g_tok[:, :20]), np.asarray(b_tok))


def test_beam_runs_and_sorted(model_and_params, rng):
    model, params = model_and_params
    enc = rng.standard_normal((2, 9, 32)).astype(np.float32)
    enc_lens = np.array([9, 9], np.int32)
    best_tok, best_len, nb_tok, nb_len, nb_logp = rnnt_beam_decode(
        model, params, jnp.asarray(enc), enc_lens, BLANK, beam_size=4, max_tokens=16
    )
    logp = np.asarray(nb_logp)
    assert np.all(np.isfinite(logp[:, 0]))
    # the reported best equals the max-logp hypothesis
    for b in range(2):
        i = int(np.argmax(logp[b]))
        assert list(np.asarray(nb_tok[b, i, : int(nb_len[b, i])])) == list(
            np.asarray(best_tok[b, : int(best_len[b])])
        )
    # no duplicate surviving hypotheses with finite scores
    for b in range(2):
        seen = set()
        for i in range(4):
            if logp[b, i] > -1e29:
                key = tuple(np.asarray(nb_tok[b, i, : int(nb_len[b, i])]))
                assert key not in seen
                seen.add(key)


def test_merge_duplicates():
    tokens = jnp.asarray(np.array([[[1, 2, 0], [1, 2, 0], [3, 0, 0], [1, 2, 0]]], np.int32))
    lens = jnp.asarray(np.array([[2, 2, 1, 3]], np.int32))
    logp = jnp.asarray(np.array([[np.log(0.2), np.log(0.3), np.log(0.1), np.log(0.4)]], np.float32))
    merged = np.asarray(_merge_duplicates(tokens, lens, logp))
    # candidates 0 and 1 identical -> merged at 0; candidate 3 differs by len
    np.testing.assert_allclose(merged[0, 0], np.log(0.5), rtol=1e-5)
    assert merged[0, 1] < -1e29
    np.testing.assert_allclose(merged[0, 2], np.log(0.1), rtol=1e-5)
    np.testing.assert_allclose(merged[0, 3], np.log(0.4), rtol=1e-5)


def test_beam_multi_emission(model_and_params, rng):
    """n_steps > 1 (multiple emissions per frame) produces valid, finite,
    deduplicated hypotheses. (Top scores are not strictly comparable to
    n_steps=1 because beam pruning interacts with the larger expansion set.)"""
    model, params = model_and_params
    enc = rng.standard_normal((2, 7, 32)).astype(np.float32)
    enc_lens = np.array([7, 7], np.int32)
    tok, ln, nb_tok, nb_len, lp3 = rnnt_beam_decode(
        model, params, jnp.asarray(enc), enc_lens,
        BLANK, beam_size=4, max_tokens=16, n_steps=3)
    lp3 = np.asarray(lp3)
    assert np.all(np.isfinite(lp3.max(1)))
    for b in range(2):
        assert BLANK not in np.asarray(tok[b, : int(ln[b])])
        seen = set()
        for i in range(4):
            if lp3[b, i] > -1e29:
                key = tuple(np.asarray(nb_tok[b, i, : int(nb_len[b, i])]))
                assert key not in seen
                seen.add(key)
