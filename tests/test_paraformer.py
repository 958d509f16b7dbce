"""CIF aligner + Paraformer NAR model tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuasr.config import EncoderConfig
from tpuasr.models.paraformer import Paraformer, ParaformerConfig
from tpuasr.nn.cif import cif_fire, quantity_loss


def test_cif_fire_uniform_weights():
    """alpha = 0.5 everywhere: each token integrates exactly two frames."""
    b, t, d = 1, 8, 4
    hidden = np.arange(t, dtype=np.float32)[None, :, None].repeat(d, 2)[None][0][None]
    hidden = np.broadcast_to(
        np.arange(t, dtype=np.float32)[None, :, None], (b, t, d)
    ).copy()
    alpha = np.full((b, t), 0.5, np.float32)
    out = np.asarray(cif_fire(jnp.asarray(hidden), jnp.asarray(alpha), 4))
    # token k = 0.5*h[2k] + 0.5*h[2k+1]
    for k in range(4):
        np.testing.assert_allclose(out[0, k], (2 * k + 2 * k + 1) / 2.0, rtol=1e-5)


def test_cif_fire_boundary_split():
    """A frame whose span crosses a boundary splits its weight."""
    hidden = np.ones((1, 3, 2), np.float32)
    alpha = np.array([[0.6, 0.6, 0.8]], np.float32)
    out = np.asarray(cif_fire(jnp.asarray(hidden), jnp.asarray(alpha), 2))
    # token0: 0.6 (frame0) + 0.4 (part of frame1) = 1.0
    np.testing.assert_allclose(out[0, 0], 1.0, rtol=1e-5)
    # token1: 0.2 (rest of frame1) + 0.8 (frame2) = 1.0
    np.testing.assert_allclose(out[0, 1], 1.0, rtol=1e-5)


def test_quantity_loss():
    # sum |pred - tgt| / sum tgt (wenet/paraformer/paraformer.py:188-196)
    np.testing.assert_allclose(
        float(quantity_loss(jnp.asarray([3.0, 5.0]), np.array([4, 5]))), 1.0 / 9.0
    )


def test_paraformer_forward_and_decode(rng):
    cfg = ParaformerConfig(
        vocab_size=24,
        encoder=EncoderConfig(
            output_size=32, attention_heads=2, linear_units=64, num_blocks=2,
            cnn_module_kernel=7, dropout_rate=0.0, positional_dropout_rate=0.0,
        ),
        decoder_blocks=2, decoder_heads=2, decoder_ffn=64, max_tokens=8,
    )
    model = Paraformer(cfg)
    feats = rng.standard_normal((2, 67, 80)).astype(np.float32)
    feat_lens = np.array([67, 50], np.int32)
    texts = rng.integers(6, 24, (2, 8)).astype(np.int32)
    text_lens = np.array([5, 3], np.int32)
    params = model.init(jax.random.PRNGKey(0), feats, feat_lens, texts, text_lens)
    out = model.apply(params, feats, feat_lens, texts, text_lens)
    assert set(out) == {"loss", "loss_ce", "loss_quantity"}
    assert np.isfinite(float(out["loss"]))

    g = jax.grad(lambda p: model.apply(p, feats, feat_lens, texts, text_lens)["loss"])(params)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g))

    tokens, lens = model.apply(params, feats, feat_lens, method="greedy_decode")
    assert tokens.shape == (2, 8)
    assert np.all(np.asarray(lens) >= 0)
