"""Fused joint+RNN-T loss kernel (interpret mode) vs the unfused composition
(materialized joint logits + losses.rnnt) — values and all four gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuasr.losses import rnnt_loss_from_logits
from tpuasr.ops.rnnt_fused_pallas import rnnt_loss_fused_mean


def _case(rng, b=2, t=9, u=5, d=16, v=12, blank=3):
    enc_p = rng.standard_normal((b, t, d)).astype(np.float32)
    pred_p = rng.standard_normal((b, u + 1, d)).astype(np.float32)
    w = (rng.standard_normal((d, v)) / np.sqrt(d)).astype(np.float32)
    bias = rng.standard_normal(v).astype(np.float32) * 0.1
    labels = rng.integers(4, v, size=(b, u)).astype(np.int32)
    t_lens = (t - rng.integers(0, 4, size=b)).astype(np.int32)
    u_lens = (u - rng.integers(0, 3, size=b)).astype(np.int32)
    t_lens[0], u_lens[0] = t, u
    return enc_p, pred_p, w, bias, labels, t_lens, u_lens, blank


def _unfused(enc_p, pred_p, w, bias, labels, t_lens, u_lens, blank):
    joined = jnp.tanh(enc_p[:, :, None, :] + pred_p[:, None, :, :])
    logits = jnp.einsum("btud,dv->btuv", joined, w) + bias
    return rnnt_loss_from_logits(logits, labels, t_lens, u_lens, blank, "mean",
                                 use_pallas=False)


def test_fused_matches_unfused_value(rng):
    args = _case(rng)
    ref = float(_unfused(*[jnp.asarray(a) if isinstance(a, np.ndarray) else a for a in args]))
    got = float(rnnt_loss_fused_mean(*args[:4], *args[4:], interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_fused_matches_unfused_grads(rng):
    enc_p, pred_p, w, bias, labels, t_lens, u_lens, blank = _case(rng, t=7, u=4)

    def ref_fn(e, p, ww, bb):
        return _unfused(e, p, ww, bb, labels, t_lens, u_lens, blank)

    def fused_fn(e, p, ww, bb):
        return rnnt_loss_fused_mean(e, p, ww, bb, labels, t_lens, u_lens, blank,
                                    interpret=True)

    args4 = (jnp.asarray(enc_p), jnp.asarray(pred_p), jnp.asarray(w), jnp.asarray(bias))
    g_ref = jax.grad(ref_fn, argnums=(0, 1, 2, 3))(*args4)
    g_got = jax.grad(fused_fn, argnums=(0, 1, 2, 3))(*args4)
    names = ["d_enc_p", "d_pred_p", "dW", "db"]
    for name, a, b_ in zip(names, g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3,
                                   atol=1e-4, err_msg=name)


def test_fused_large_shapes_smoke(rng):
    # flagship-like shapes through the tiled grid (interpret mode)
    enc_p, pred_p, w, bias, labels, t_lens, u_lens, blank = _case(
        rng, b=3, t=20, u=9, d=32, v=40, blank=5
    )
    loss = float(rnnt_loss_fused_mean(enc_p, pred_p, w, bias, labels, t_lens,
                                      u_lens, blank, interpret=True))
    assert np.isfinite(loss) and loss > 0


def test_transducer_fused_path_matches_unfused(rng):
    """Transducer loss with fused_joint_loss must match the materialized
    path (same params)."""
    import dataclasses

    from tests.test_models import small_model_cfg
    from tpuasr.models import Transducer

    cfg = small_model_cfg()
    model = Transducer(cfg)
    feats = rng.standard_normal((2, 67, 80)).astype(np.float32)
    feat_lens = np.array([67, 50], np.int32)
    texts = rng.integers(6, cfg.vocab_size, size=(2, 5)).astype(np.int32)
    text_lens = np.array([5, 3], np.int32)
    params = model.init(jax.random.PRNGKey(0), feats, feat_lens, texts, text_lens)
    ref = model.apply(params, feats, feat_lens, texts, text_lens)

    cfg_f = dataclasses.replace(cfg, fused_joint_loss=True)
    model_f = Transducer(cfg_f)
    got = model_f.apply(params, feats, feat_lens, texts, text_lens)
    np.testing.assert_allclose(float(got["loss"]), float(ref["loss"]),
                               rtol=1e-4, atol=1e-4)

    g_ref = jax.grad(lambda p: model.apply(p, feats, feat_lens, texts, text_lens)["loss"])(params)
    g_got = jax.grad(lambda p: model_f.apply(p, feats, feat_lens, texts, text_lens)["loss"])(params)
    for (ka, a), (kb, b_) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g_got), key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(g_ref), key=lambda kv: str(kv[0])),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-3,
                                   atol=1e-4, err_msg=str(ka))
