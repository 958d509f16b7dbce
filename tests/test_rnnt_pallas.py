"""Pallas RNN-T kernel (interpret mode on CPU) vs the jnp associative-scan
lattice — values and gradients, variable lengths."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuasr.losses import rnnt_loss
from tpuasr.ops.rnnt_pallas import rnnt_loss_pallas


def _case(rng, b=3, t=11, u=6, v=8, blank=2):
    logits = rng.standard_normal((b, t, u + 1, v)).astype(np.float32)
    labels = rng.integers(3, v, size=(b, u)).astype(np.int32)
    t_lens = np.array([t, t - 4, t - 2], np.int32)[:b]
    u_lens = np.array([u, u - 3, u - 1], np.int32)[:b]
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    return lp, labels, t_lens, u_lens, blank


def test_pallas_rnnt_matches_jnp(rng):
    lp, labels, tl, ul, blank = _case(rng)
    ref = np.asarray(rnnt_loss(lp, labels, tl, ul, blank))
    got = np.asarray(rnnt_loss_pallas(lp, labels, tl, ul, blank, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pallas_rnnt_grad_matches_jnp(rng):
    lp, labels, tl, ul, blank = _case(rng, b=2, t=7, u=4, v=6)
    g_ref = jax.grad(lambda x: jnp.sum(rnnt_loss(x, labels, tl, ul, blank)))(lp)
    g_got = jax.grad(
        lambda x: jnp.sum(rnnt_loss_pallas(x, labels, tl, ul, blank, interpret=True))
    )(lp)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=1e-3, atol=1e-4)


def test_pallas_rnnt_batch_tiling(rng):
    # b > tile size exercises the grid
    lp, labels, tl, ul, blank = _case(rng, b=3, t=9, u=5, v=7)
    lp10 = jnp.tile(lp, (4, 1, 1, 1))[:10]
    labels10 = np.tile(labels, (4, 1))[:10]
    tl10 = np.tile(tl, 4)[:10]
    ul10 = np.tile(ul, 4)[:10]
    ref = np.asarray(rnnt_loss(lp10, labels10, tl10, ul10, blank))
    got = np.asarray(rnnt_loss_pallas(lp10, labels10, tl10, ul10, blank, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
