"""Fused FFN kernel (ops/ffn_pallas.py) vs the module chain.

Contracts: deterministic output matches `x + s*ffn(norm(x))` to tolerance
(values AND grads, incl. accumulated weight grads across row tiles); the
whole-encoder forward matches with the flag flipped; with caller-drawn
dropout masks the backward applies the exact forward masks (finite
differences agree THROUGH the dropout) and masks behave like nn.Dropout
(scaling by 1/keep, zeros where dropped).
"""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.config import EncoderConfig
from tpuasr.nn.conformer import ConformerEncoder
from tpuasr.ops.ffn_pallas import fused_ffn


def _ref(x, g, b, w1, b1, w2, b2, scale, m1=None, m2=None, rate=0.0):
    xn = nn.LayerNorm(epsilon=1e-6).apply(
        {"params": {"scale": g, "bias": b}}, x)
    h = xn @ w1 + b1
    a = h * jax.nn.sigmoid(h)
    if m1 is not None:
        a = jnp.where(m1 != 0, a / (1 - rate), 0.0)
    y = a @ w2 + b2
    if m2 is not None:
        y = jnp.where(m2 != 0, y / (1 - rate), 0.0)
    return x + scale * y


def _args(r=300, d=64, hidden=128, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    x = jax.random.normal(ks[0], (r, d), dtype)
    g = jnp.ones((d,)) + 0.1 * jax.random.normal(ks[1], (d,))
    b = 0.1 * jax.random.normal(ks[2], (d,))
    w1 = (jax.random.normal(ks[3], (d, hidden), dtype) / np.sqrt(d))
    b1 = 0.1 * jax.random.normal(ks[4], (hidden,), dtype)
    w2 = (jax.random.normal(ks[5], (hidden, d), dtype) / np.sqrt(hidden))
    b2 = 0.1 * jax.random.normal(ks[6], (d,), dtype)
    return x, g, b, w1, b1, w2, b2


def test_deterministic_forward_and_grads():
    x, g, b, w1, b1, w2, b2 = _args()
    out = fused_ffn(x, g, b, w1, b1, w2, b2, None, None, 0.1, 0.5, True)
    ref = _ref(x, g, b, w1, b1, w2, b2, 0.5)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    def loss_fused(args):
        return jnp.sum(fused_ffn(*args, None, None, 0.1, 0.5, True) ** 2)

    def loss_ref(args):
        return jnp.sum(_ref(*args, 0.5) ** 2)

    gf = jax.grad(loss_fused)((x, g, b, w1, b1, w2, b2))
    gr = jax.grad(loss_ref)((x, g, b, w1, b1, w2, b2))
    for a_, r_ in zip(gf, gr):
        np.testing.assert_allclose(a_, r_, rtol=2e-4, atol=2e-4)


def test_row_padding():
    # row count not a multiple of the 256-row tile
    x, g, b, w1, b1, w2, b2 = _args(r=70)
    out = fused_ffn(x, g, b, w1, b1, w2, b2, None, None, 0.0, 1.0, True)
    ref = _ref(x, g, b, w1, b1, w2, b2, 1.0)
    assert out.shape == x.shape
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_dropout_masks_exact_and_grads_through():
    x, g, b, w1, b1, w2, b2 = _args(r=512)
    rate = 0.5
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    m1 = jax.random.bernoulli(k1, 1 - rate, (512, 128)).astype(jnp.uint8)
    m2 = jax.random.bernoulli(k2, 1 - rate, (512, 64)).astype(jnp.uint8)

    # forward with masks == reference dropout arithmetic, exactly
    out = fused_ffn(x, g, b, w1, b1, w2, b2, m1, m2, rate, 1.0, False)
    ref = _ref(x, g, b, w1, b1, w2, b2, 1.0, m1, m2, rate)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    # gradients THROUGH the dropout: fused bwd reuses the saved masks
    def loss_f(args):
        return jnp.sum(fused_ffn(*args, m1, m2, rate, 1.0, False) ** 2)

    def loss_r(args):
        return jnp.sum(_ref(*args, 1.0, m1, m2, rate) ** 2)

    gf = jax.grad(loss_f)((x, g, b, w1, b1, w2, b2))
    gr = jax.grad(loss_r)((x, g, b, w1, b1, w2, b2))
    for a_, r_ in zip(gf, gr):
        np.testing.assert_allclose(a_, r_, rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("macaron", [True, False])
def test_encoder_parity_with_flag(macaron):
    cfg = EncoderConfig(
        output_size=64, attention_heads=2, linear_units=128, num_blocks=2,
        dropout_rate=0.0, positional_dropout_rate=0.0, macaron_style=macaron,
        cnn_module_kernel=7,
    )
    x = np.random.default_rng(0).normal(size=(2, 50, 80)).astype(np.float32)
    lens = np.asarray([50, 37], np.int32)
    enc = ConformerEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0), x, lens)
    ref, ref_lens = enc.apply(params, x, lens)

    cfg_f = dataclasses.replace(cfg, fused_ffn=True)
    enc_f = ConformerEncoder(cfg_f)
    out, out_lens = enc_f.apply(params, x, lens)
    assert np.array_equal(np.asarray(ref_lens), np.asarray(out_lens))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


def test_encoder_training_mode_runs_with_dropout():
    cfg = EncoderConfig(
        output_size=64, attention_heads=2, linear_units=128, num_blocks=2,
        dropout_rate=0.1, positional_dropout_rate=0.0, cnn_module_kernel=7,
        fused_ffn=True,
    )
    x = np.random.default_rng(0).normal(size=(2, 40, 80)).astype(np.float32)
    lens = np.asarray([40, 40], np.int32)
    enc = ConformerEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0), x, lens)
    out, _ = enc.apply(params, x, lens, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(np.asarray(out)).all()
    # different dropout rngs -> different outputs
    out2, _ = enc.apply(params, x, lens, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(out), np.asarray(out2))
