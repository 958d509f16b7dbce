"""CTC loss golden tests vs torch.nn.CTCLoss (the exact native op the
reference calls, model/model.py:281-293) and optax.ctc_loss, plus gradient
parity."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch

from tpuasr.losses import ctc_loss, ctc_loss_from_logits


def _rand_case(rng, b=3, t=20, v=7, u=6, blank=0):
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    labels = rng.integers(1, v, size=(b, u)).astype(np.int32)
    input_lens = np.array([t, t - 3, t - 7], dtype=np.int32)[:b]
    label_lens = np.array([u, u - 2, u - 4], dtype=np.int32)[:b]
    return logits, labels, input_lens, label_lens


def _torch_ctc(logits, labels, input_lens, label_lens, blank=0):
    lp = torch.log_softmax(torch.from_numpy(logits), dim=-1).transpose(0, 1)  # [T,B,V]
    return torch.nn.CTCLoss(blank=blank, reduction="none", zero_infinity=True)(
        lp, torch.from_numpy(labels), torch.from_numpy(input_lens), torch.from_numpy(label_lens)
    ).numpy()


def test_ctc_matches_torch(rng):
    logits, labels, input_lens, label_lens = _rand_case(rng)
    ref = _torch_ctc(logits, labels, input_lens, label_lens)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    got = np.asarray(ctc_loss(lp, input_lens, labels, label_lens, blank=0))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_ctc_matches_optax(rng):
    logits, labels, input_lens, label_lens = _rand_case(rng, b=2, t=15, v=9, u=5)
    t, u = logits.shape[1], labels.shape[1]
    logit_pad = (np.arange(t)[None, :] >= input_lens[:, None]).astype(np.float32)
    label_pad = (np.arange(u)[None, :] >= label_lens[:, None]).astype(np.float32)
    ref = optax.ctc_loss(jnp.asarray(logits), jnp.asarray(logit_pad),
                         jnp.asarray(labels), jnp.asarray(label_pad), blank_id=0)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    got = ctc_loss(lp, input_lens, labels, label_lens, blank=0)
    # optax floors log-space accumulations at log_epsilon=-1e5, which shifts
    # padded rows by ~1e-2; torch parity (exact) is the stricter test above.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-3, atol=5e-2)


def test_ctc_nonzero_blank_and_repeats(rng):
    v, blank = 8, 5
    logits = rng.standard_normal((1, 12, v)).astype(np.float32)
    labels = np.array([[2, 2, 3, 3]], dtype=np.int32)  # repeats force blank hops
    il = np.array([12], np.int32)
    ll = np.array([4], np.int32)
    ref = _torch_ctc(logits, labels, il, ll, blank=blank)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    got = np.asarray(ctc_loss(lp, il, labels, ll, blank=blank))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_ctc_grad_matches_torch(rng):
    logits, labels, input_lens, label_lens = _rand_case(rng, b=2, t=10, v=6, u=4)
    tl = torch.from_numpy(logits).requires_grad_(True)
    lp = torch.log_softmax(tl, dim=-1).transpose(0, 1)
    loss = torch.nn.CTCLoss(blank=0, reduction="sum", zero_infinity=True)(
        lp, torch.from_numpy(labels), torch.from_numpy(input_lens), torch.from_numpy(label_lens)
    )
    loss.backward()
    ref_grad = tl.grad.numpy()

    def f(x):
        return jnp.sum(ctc_loss_from_logits(x, input_lens, labels, label_lens, 0, "sum"))

    got_grad = np.asarray(jax.grad(f)(jnp.asarray(logits)))
    np.testing.assert_allclose(got_grad, ref_grad, rtol=1e-3, atol=1e-4)


def test_ctc_zero_infinity(rng):
    # T shorter than required alignment length -> loss 0, grad 0
    logits = rng.standard_normal((1, 3, 5)).astype(np.float32)
    labels = np.array([[1, 1, 2, 2]], dtype=np.int32)  # needs >= 7 frames
    il, ll = np.array([3], np.int32), np.array([4], np.int32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    got = np.asarray(ctc_loss(lp, il, labels, ll, blank=0))
    assert got[0] == 0.0
    g = jax.grad(lambda x: jnp.sum(ctc_loss_from_logits(x, il, labels, ll, 0, "sum")))(
        jnp.asarray(logits)
    )
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)


def test_ctc_empty_label(rng):
    logits = rng.standard_normal((1, 5, 4)).astype(np.float32)
    labels = np.zeros((1, 3), np.int32)
    il, ll = np.array([5], np.int32), np.array([0], np.int32)
    ref = _torch_ctc(logits, labels, il, ll, blank=0)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    got = np.asarray(ctc_loss(lp, il, labels, ll, blank=0))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
