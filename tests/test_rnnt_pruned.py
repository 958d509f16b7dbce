"""Pruned (banded) RNN-T loss vs the full lattice
(wenet/transducer/transducer.py:500-570 semantics, linear-alignment band)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.losses.rnnt import rnnt_loss
from tpuasr.losses.rnnt_pruned import band_offsets, rnnt_loss_pruned

BLANK = 0


def make_problem(b=3, t=12, u=6, d=8, v=11, seed=0):
    rng = np.random.default_rng(seed)
    enc_p = rng.standard_normal((b, t, d)).astype(np.float32) * 0.5
    pred_p = rng.standard_normal((b, u + 1, d)).astype(np.float32) * 0.5
    w = rng.standard_normal((d, v)).astype(np.float32) * 0.3
    bias = rng.standard_normal((v,)).astype(np.float32) * 0.1
    labels = rng.integers(1, v, (b, u)).astype(np.int32)
    t_lens = np.array([t, t - 2, t - 4], np.int32)[:b]
    u_lens = np.array([u, u - 1, u - 3], np.int32)[:b]
    return enc_p, pred_p, w, bias, labels, t_lens, u_lens


def full_loss(enc_p, pred_p, w, bias, labels, t_lens, u_lens, reduction="none"):
    h = jnp.tanh(enc_p[:, :, None, :] + pred_p[:, None, :, :])
    logits = jnp.einsum("btud,dv->btuv", h, w) + bias
    lp = jax.nn.log_softmax(logits, axis=-1)
    return {
        "none": lambda x: x, "mean": jnp.mean, "sum": jnp.sum,
    }[reduction](rnnt_loss(lp, labels, t_lens, u_lens, BLANK))


def test_wide_band_equals_full():
    args = make_problem()
    want = np.asarray(full_loss(*args))
    got = np.asarray(rnnt_loss_pruned(*args, blank=BLANK, s_range=7 + 2,
                                      reduction="none"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_moderate_band_close_to_full():
    """s_range spanning the alignment jitter captures nearly all path mass."""
    args = make_problem(b=2, t=20, u=8)
    want = np.asarray(full_loss(*args, reduction="none"))
    got = np.asarray(rnnt_loss_pruned(*args, blank=BLANK, s_range=6,
                                      reduction="none"))
    assert np.all(got >= want - 1e-4)  # band excludes paths -> nll >= full
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.5)


def test_band_offsets_monotonic_and_covering():
    t_lens = jnp.array([20, 14], jnp.int32)
    u_lens = jnp.array([8, 5], jnp.int32)
    lo = np.asarray(band_offsets(t_lens, u_lens, 20, 4))
    assert np.all(np.diff(lo, axis=1) >= 0)
    assert lo[0, 0] == 0 and lo[1, 0] == 0
    # final valid frame's band covers u_len
    assert lo[0, 19] + 4 - 1 >= 8
    assert lo[1, 13] + 4 - 1 >= 5
    # padded frames keep the final band (no spurious shift)
    assert lo[1, 19] == lo[1, 13]


def test_gradients_flow_and_match_wide_band():
    args = make_problem(b=2, t=10, u=4)
    enc_p, pred_p, w, bias, labels, t_lens, u_lens = args

    def f_pruned(e, p):
        return rnnt_loss_pruned(e, p, w, bias, labels, t_lens, u_lens,
                                blank=BLANK, s_range=5 + 2, reduction="mean")

    def f_full(e, p):
        return jnp.mean(full_loss(e, p, w, bias, labels, t_lens, u_lens))

    ge, gp = jax.grad(f_pruned, argnums=(0, 1))(enc_p, pred_p)
    fe, fp = jax.grad(f_full, argnums=(0, 1))(enc_p, pred_p)
    np.testing.assert_allclose(np.asarray(ge), np.asarray(fe), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(fp), rtol=2e-4, atol=2e-4)


def test_transducer_prune_range_config():
    """Model-level flag: rnnt_prune_range > 0 trains through the banded loss."""
    from tpuasr.config import EncoderConfig, ModelConfig, PredictorConfig
    from tpuasr.models import Transducer

    cfg = ModelConfig(
        vocab_size=20, blank_id=5, rnnt_prune_range=4, ctc_weight=0.0,
        encoder=EncoderConfig(
            output_size=32, attention_heads=2, linear_units=64, num_blocks=1,
            cnn_module_kernel=7, dropout_rate=0.0, positional_dropout_rate=0.0,
        ),
        predictor=PredictorConfig(embed_size=16, hidden_size=16, output_size=32),
    )
    model = Transducer(cfg)
    b, t, u = 2, 67, 5
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((b, t, 80)).astype(np.float32)
    feat_lens = np.full((b,), t, np.int32)
    texts = rng.integers(6, 19, (b, u)).astype(np.int32)
    text_lens = np.full((b,), u, np.int32)
    params = model.init(jax.random.PRNGKey(0), feats, feat_lens, texts, text_lens)

    def loss_fn(p):
        return model.apply(p, feats, feat_lens, texts, text_lens)["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = float(jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads))))
    assert gnorm > 0
