"""Pallas fused rel-pos attention == unfused einsum path (fwd + grads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.nn.attention import RelPositionMultiHeadedAttention

B, T, H, D = 3, 21, 2, 32  # deliberately unaligned T (pad path)


@pytest.fixture(scope="module")
def inputs(rng=None):
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((B, T, D)), jnp.float32)
    pe = jnp.asarray(r.standard_normal((1, T, D)) * 0.5, jnp.float32)
    # chunked causal-ish mask with one fully-masked (padded) query row
    i = np.arange(T)
    m = (i[None, :, None] // 4 >= i[None, None, :] // 4) & (i[None, None, :] >= i[None, :, None] - 8)
    m = np.repeat(m, B, axis=0)
    m[1, -1, :] = False  # fully-masked row must produce zero attention
    return x, pe, jnp.asarray(m)


def _apply(fused, x, pe, mask, params=None):
    mod = RelPositionMultiHeadedAttention(H, D, 0.0, jnp.float32, fused=fused)
    if params is None:
        params = mod.init(jax.random.PRNGKey(0), x, mask, pe)
    out, _ = mod.apply(params, x, mask, pe)
    return out, params


def test_fused_matches_unfused_forward(inputs):
    x, pe, mask = inputs
    ref, params = _apply(False, x, pe, mask)
    fused, _ = _apply(True, x, pe, mask, params)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_fused_matches_unfused_grads(inputs):
    x, pe, mask = inputs
    _, params = _apply(False, x, pe, mask)
    mod_r = RelPositionMultiHeadedAttention(H, D, 0.0, jnp.float32, fused=False)
    mod_f = RelPositionMultiHeadedAttention(H, D, 0.0, jnp.float32, fused=True)

    def loss(p, mod, xx):
        out, _ = mod.apply(p, xx, mask, pe)
        return jnp.sum(out * out)

    gr_p, gr_x = jax.grad(lambda p, xx: loss(p, mod_r, xx), argnums=(0, 1))(params, x)
    gf_p, gf_x = jax.grad(lambda p, xx: loss(p, mod_f, xx), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gr_x),
                               rtol=3e-5, atol=2e-5)
    for a, b in zip(jax.tree.leaves(gf_p), jax.tree.leaves(gr_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=2e-5)


def test_fused_encoder_matches_unfused(inputs):
    """Whole-encoder check: fused_attention config flag flips only the
    attention internals, not the encoder output (f32)."""
    import dataclasses

    from tpuasr.config import EncoderConfig, ModelConfig, PredictorConfig
    from tpuasr.models import Transducer

    r = np.random.default_rng(1)
    feats = jnp.asarray(r.standard_normal((2, 67, 80)), jnp.float32)
    lens = jnp.asarray([67, 51], jnp.int32)
    enc = EncoderConfig(
        output_size=32, attention_heads=2, linear_units=64, num_blocks=2,
        cnn_module_kernel=7, dropout_rate=0.0, positional_dropout_rate=0.0,
        causal=True, use_dynamic_chunk=False, static_chunk_size=4,
    )
    mk = lambda e: ModelConfig(
        vocab_size=20, blank_id=5, encoder=e,
        predictor=PredictorConfig(embed_size=16, hidden_size=16, output_size=32),
    )
    m_ref = Transducer(mk(enc))
    params = m_ref.init(jax.random.PRNGKey(0), feats, lens,
                        np.zeros((2, 4), np.int32), np.array([4, 4], np.int32))
    y_ref, l_ref = m_ref.apply(params, feats, lens, method="encode")
    m_fused = Transducer(mk(dataclasses.replace(enc, fused_attention=True)))
    y_fused, l_fused = m_fused.apply(params, feats, lens, method="encode")
    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_fused))
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)
