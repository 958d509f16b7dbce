"""SANM / LFR / Paraformer-extension tests.

Covers: LFR stacking vs an independent per-sequence reference, FSMN-memory
attention shapes and padding invariance, the SANM Paraformer stack
(forward/grads/decode), the glancing sampler, the tail-threshold CIF path,
CIF peaks vs the reference's sequential integrate-and-fire, the timestamp
branch, and the NAR positionwise beam search (top-1 == greedy).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.config import EncoderConfig
from tpuasr.decode.paraformer_beam import nar_beam_search
from tpuasr.models.paraformer import Paraformer, ParaformerConfig
from tpuasr.nn.cif import cif_peaks, quantity_loss
from tpuasr.nn.sanm import SanmDecoder, SanmEncoder, lfr


def lfr_reference(x: np.ndarray, length: int, m: int, n: int) -> np.ndarray:
    """Independent per-sequence LFR (the wenet/paraformer/layers.py:23-92
    algorithm: head-repeat left padding, tail-repeat right padding, unfold)."""
    left = (m - 1) // 2
    n_lfr = math.ceil(length / n)
    prepad = length + left
    right = max(0, m - (prepad - n * (n_lfr - 1)))
    frames = np.concatenate(
        [np.repeat(x[:1], left, 0), x[:length], np.repeat(x[length - 1 : length], right, 0)]
    )
    new_len = (left + length + right) // n
    # windows may run past the padded tail for some (m, n); extend with the
    # last frame (same value the reference's tail padding would carry)
    need = (new_len - 1) * n + m
    if need > frames.shape[0]:
        frames = np.concatenate(
            [frames, np.repeat(frames[-1:], need - frames.shape[0], 0)]
        )
    out = np.stack([frames[i * n : i * n + m].reshape(-1) for i in range(new_len)])
    return out


@pytest.mark.parametrize("m,n", [(7, 6), (5, 4), (1, 1)])
def test_lfr_matches_reference(rng, m, n):
    b, t, d = 3, 29, 4
    x = rng.standard_normal((b, t, d)).astype(np.float32)
    lens = np.array([29, 17, 5], np.int32)
    out, new_lens = jax.jit(lfr, static_argnums=(2, 3))(x, lens, m, n)
    out, new_lens = np.asarray(out), np.asarray(new_lens)
    for i in range(b):
        ref = lfr_reference(x[i], int(lens[i]), m, n)
        assert new_lens[i] == ref.shape[0]
        np.testing.assert_allclose(out[i, : new_lens[i]], ref, rtol=1e-6)


def test_sanm_encoder_padding_invariance(rng):
    """Padded frames must not change valid outputs."""
    enc = SanmEncoder(input_size=24, output_size=16, attention_heads=2,
                      linear_units=32, num_blocks=2, kernel_size=5)
    x = rng.standard_normal((2, 12, 24)).astype(np.float32)
    lens = np.array([12, 7], np.int32)
    params = enc.init(jax.random.PRNGKey(0), x, lens)
    y1, _ = enc.apply(params, x, lens)
    x2 = x.copy()
    x2[1, 7:] = 99.0  # garbage in the padded region of row 1
    y2, _ = enc.apply(params, x2, lens)
    np.testing.assert_allclose(np.asarray(y1[1, :7]), np.asarray(y2[1, :7]),
                               rtol=2e-5, atol=2e-5)


def test_sanm_decoder_shapes(rng):
    dec = SanmDecoder(vocab_size=11, n_feat=16, attention_heads=2,
                      linear_units=32, num_blocks=2, kernel_size=5)
    mem = rng.standard_normal((2, 9, 16)).astype(np.float32)
    emb = rng.standard_normal((2, 5, 16)).astype(np.float32)
    params = dec.init(jax.random.PRNGKey(0), mem, np.array([9, 6]), emb,
                      np.array([5, 3]))
    out = dec.apply(params, mem, np.array([9, 6]), emb, np.array([5, 3]))
    assert out.shape == (2, 5, 11)
    assert np.all(np.isfinite(np.asarray(out)))


def _sanm_cfg(**kw):
    return ParaformerConfig(
        vocab_size=24,
        encoder=EncoderConfig(
            input_size=8, output_size=16, attention_heads=2, linear_units=32,
            num_blocks=2, dropout_rate=0.0, positional_dropout_rate=0.0,
        ),
        encoder_type="sanm", lfr_m=3, lfr_n=2, sanm_kernel=5,
        decoder_blocks=2, decoder_heads=2, decoder_ffn=32, max_tokens=8,
        cif_dropout=0.0, **kw,
    )


def test_sanm_paraformer_forward_grads_decode(rng):
    cfg = _sanm_cfg(ctc_weight=0.3, ctc_blank=5, timestamp_branch=True)
    model = Paraformer(cfg)
    feats = rng.standard_normal((2, 37, 8)).astype(np.float32)
    feat_lens = np.array([37, 21], np.int32)
    texts = rng.integers(6, 24, (2, 6)).astype(np.int32)
    text_lens = np.array([5, 3], np.int32)
    params = model.init(jax.random.PRNGKey(0), feats, feat_lens, texts, text_lens)
    out = model.apply(params, feats, feat_lens, texts, text_lens)
    assert {"loss", "loss_ce", "loss_quantity", "loss_ctc",
            "loss_quantity_tp"} <= set(out)
    assert np.isfinite(float(out["loss"]))

    g = jax.grad(
        lambda p: model.apply(p, feats, feat_lens, texts, text_lens)["loss"]
    )(params)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g))

    tokens, lens = model.apply(params, feats, feat_lens, method="greedy_decode")
    assert tokens.shape == (2, 8)
    tokens, lens, times = model.apply(params, feats, feat_lens,
                                      method="greedy_decode_with_times")
    t = np.asarray(times)
    assert t.shape == (2, 8)
    # fire times are nondecreasing within the valid span
    for i in range(2):
        v = t[i, : int(np.asarray(lens)[i])]
        assert np.all(np.diff(v) >= 0)


def test_sampler_replaces_positions(rng):
    """With a sampler rng, the loss changes and stays finite; without one,
    the forward is the pure acoustic-embedding pass."""
    cfg = _sanm_cfg(sampling_ratio=1.0)
    model = Paraformer(cfg)
    feats = rng.standard_normal((2, 25, 8)).astype(np.float32)
    feat_lens = np.array([25, 25], np.int32)
    texts = rng.integers(6, 24, (2, 6)).astype(np.int32)
    text_lens = np.array([6, 4], np.int32)
    params = model.init(jax.random.PRNGKey(0), feats, feat_lens, texts, text_lens)
    base = model.apply(params, feats, feat_lens, texts, text_lens)
    mixed = model.apply(params, feats, feat_lens, texts, text_lens,
                        rngs={"sampler": jax.random.PRNGKey(7)})
    assert np.isfinite(float(mixed["loss"]))
    # an untrained model mispredicts nearly everything, so ratio 1.0 replaces
    # nearly every position -> the CE loss must move
    assert abs(float(mixed["loss_ce"]) - float(base["loss_ce"])) > 1e-6
    g = jax.grad(
        lambda p: model.apply(p, feats, feat_lens, texts, text_lens,
                              rngs={"sampler": jax.random.PRNGKey(7)})["loss"]
    )(params)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g))


def test_cif_peaks_matches_sequential():
    """cif_peaks == the reference's integrate / fire / subtract loop."""
    rng = np.random.default_rng(0)
    alpha = rng.uniform(0, 1, (3, 40)).astype(np.float32)
    got = np.asarray(cif_peaks(jnp.asarray(alpha), 1.0))
    for b in range(3):
        integrate, fires = 0.0, np.zeros(40)
        for t in range(40):
            integrate += alpha[b, t]
            if integrate >= 1.0:
                fires[t] = 1.0
                integrate -= 1.0
        np.testing.assert_allclose(got[b], fires, atol=1e-5)


def test_quantity_loss_normalization():
    # sum |pred - tgt| / sum tgt (wenet/paraformer/paraformer.py:188-196)
    val = float(quantity_loss(jnp.asarray([3.0, 5.0]), np.array([4, 5])))
    np.testing.assert_allclose(val, 1.0 / 9.0, rtol=1e-6)


def test_nar_beam_top1_equals_greedy(rng):
    logits = rng.standard_normal((2, 7, 13)).astype(np.float32)
    lens = np.array([7, 4], np.int32)
    tokens, scores = jax.jit(nar_beam_search, static_argnums=(2, 3))(
        logits, lens, 4, 3
    )
    tokens, scores = np.asarray(tokens), np.asarray(scores)
    greedy = np.argmax(logits, -1)
    for b in range(2):
        np.testing.assert_array_equal(tokens[b, 0, : lens[b]], greedy[b, : lens[b]])
        # past the length: eos-filled
        assert np.all(tokens[b, 0, lens[b] :] == 3)
        # scores descending
        assert np.all(np.diff(scores[b]) <= 1e-6)
