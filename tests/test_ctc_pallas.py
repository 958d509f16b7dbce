"""Pallas CTC kernel (interpret mode on CPU) vs the jnp reference lattice —
values and gradients, including variable lengths and zero-infinity."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuasr.losses import ctc_loss
from tpuasr.ops.ctc_pallas import ctc_loss_pallas


def _case(rng, b=3, t=20, v=7, u=6):
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    labels = rng.integers(1, v, size=(b, u)).astype(np.int32)
    input_lens = np.array([t, t - 3, t - 7], np.int32)[:b]
    label_lens = np.array([u, u - 2, u - 4], np.int32)[:b]
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    return lp, labels, input_lens, label_lens


def test_pallas_ctc_matches_jnp(rng):
    lp, labels, il, ll = _case(rng)
    ref = np.asarray(ctc_loss(lp, il, labels, ll, blank=0))
    got = np.asarray(ctc_loss_pallas(lp, il, labels, ll, blank=0, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pallas_ctc_grad_matches_jnp(rng):
    lp, labels, il, ll = _case(rng, b=2, t=12, v=6, u=4)

    g_ref = jax.grad(lambda x: jnp.sum(ctc_loss(x, il, labels, ll, 0)))(lp)
    g_got = jax.grad(
        lambda x: jnp.sum(ctc_loss_pallas(x, il, labels, ll, 0, interpret=True))
    )(lp)
    # gradient w.r.t. log_probs (through the gather) must agree
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=1e-3, atol=1e-4)


def test_pallas_ctc_nonzero_blank(rng):
    b, t, v, u, blank = 2, 14, 9, 4, 5
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    labels = rng.integers(0, 4, size=(b, u)).astype(np.int32)
    il = np.array([t, t - 5], np.int32)
    ll = np.array([u, u - 1], np.int32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    ref = np.asarray(ctc_loss(lp, il, labels, ll, blank=blank))
    got = np.asarray(ctc_loss_pallas(lp, il, labels, ll, blank=blank, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pallas_ctc_zero_infinity(rng):
    logits = rng.standard_normal((1, 3, 5)).astype(np.float32)
    labels = np.array([[1, 1, 2, 2]], np.int32)
    il, ll = np.array([3], np.int32), np.array([4], np.int32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    got = np.asarray(ctc_loss_pallas(lp, il, labels, ll, blank=0, interpret=True))
    assert got[0] == 0.0
