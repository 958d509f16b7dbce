"""CTC loss — log-domain forward lattice in pure jnp (lax.scan over time).

Replaces the reference's native `torch.nn.CTCLoss` call sites
(model/model.py:281-293, model/rnnt_model.py:36-56, wenet/transformer/ctc.py:47-71)
with a TPU-native lattice: states are the 2U+1 blank-interleaved label
sequence, the recurrence runs as one `lax.scan` over T with vectorized [B, S]
state updates (shifts, no gathers in the loop), and autodiff provides exact
gradients. `zero_infinity` parity: impossible alignments (T too short) yield
loss 0 with zero gradient.

A fused Pallas forward-backward kernel lives in tpuasr.ops.ctc_pallas; this
module is the reference implementation it is tested against.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG = -1.0e30  # large-negative stand-in for -inf (keeps arithmetic NaN-free)


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, _NEG)  # both -NEG: avoid -inf - -inf
    return m_safe + jnp.log1p(jnp.exp(jnp.minimum(a, b) - m_safe))


def lattice_labels(labels: jnp.ndarray, blank: int) -> jnp.ndarray:
    """[B, U] -> [B, 2U+1] blank-interleaved state labels."""
    b, u = labels.shape
    s = 2 * u + 1
    lab = jnp.full((b, s), blank, labels.dtype)
    return lab.at[:, 1::2].set(labels)


@functools.partial(jax.jit, static_argnames=("blank",))
def ctc_loss(
    log_probs: jnp.ndarray,  # [B, T, V] log-softmaxed
    input_lens: jnp.ndarray,  # [B]
    labels: jnp.ndarray,  # [B, U] padded
    label_lens: jnp.ndarray,  # [B]
    blank: int = 0,
) -> jnp.ndarray:
    """Per-utterance negative log-likelihood [B]."""
    b, t, _ = log_probs.shape
    u = labels.shape[1]
    s = 2 * u + 1

    lab = lattice_labels(labels, blank)  # [B, S]
    # valid lattice states: s <= 2 * label_len
    state_idx = jnp.arange(s)[None, :]
    state_valid = state_idx <= 2 * label_lens[:, None]

    # per-state emission logprob at each t: gather once outside the scan
    # [B, T, S]
    lp_states = jnp.take_along_axis(
        log_probs, lab[:, None, :].astype(jnp.int32), axis=2
    )
    lp_states = jnp.where(state_valid[:, None, :], lp_states, _NEG)

    # skip transition allowed into odd states whose label differs from s-2
    lab_m2 = jnp.pad(lab, ((0, 0), (2, 0)), constant_values=blank)[:, :s]
    can_skip = (lab != blank) & (lab != lab_m2) & (state_idx >= 2)

    alpha0 = jnp.full((b, s), _NEG)
    alpha0 = alpha0.at[:, 0].set(lp_states[:, 0, 0])
    alpha0 = alpha0.at[:, 1].set(jnp.where(label_lens > 0, lp_states[:, 0, 1], _NEG))

    def step(alpha, inputs):
        lp_t, t_idx = inputs
        a1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=_NEG)[:, :s]
        a2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=_NEG)[:, :s]
        a2 = jnp.where(can_skip, a2, _NEG)
        new = _logaddexp(_logaddexp(alpha, a1), a2) + lp_t
        # freeze rows whose sequence already ended
        active = (t_idx < input_lens)[:, None]
        alpha = jnp.where(active, new, alpha)
        return alpha, None

    xs = (jnp.swapaxes(lp_states, 0, 1)[1:], jnp.arange(1, t))
    alpha, _ = jax.lax.scan(step, alpha0, xs)

    # final: logaddexp(alpha[2*ul], alpha[2*ul - 1])
    ul = label_lens
    last_blank = jnp.take_along_axis(alpha, (2 * ul)[:, None], axis=1)[:, 0]
    idx_lab = jnp.maximum(2 * ul - 1, 0)[:, None]
    last_label = jnp.take_along_axis(alpha, idx_lab, axis=1)[:, 0]
    last_label = jnp.where(ul > 0, last_label, _NEG)
    ll = _logaddexp(last_blank, last_label)

    nll = -ll
    # zero_infinity: unreachable (T < U + repeats) -> 0 loss, 0 grad
    feasible = ll > _NEG / 2
    return jnp.where(feasible, nll, jax.lax.stop_gradient(nll) * 0.0)


@functools.partial(jax.jit, static_argnames=("blank", "reduction", "use_pallas"))
def ctc_loss_from_logits(
    logits: jnp.ndarray,
    input_lens: jnp.ndarray,
    labels: jnp.ndarray,
    label_lens: jnp.ndarray,
    blank: int = 0,
    reduction: str = "sum_over_batch",
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Reference head semantics (model/rnnt_model.py:40-60): log_softmax +
    CTCLoss(reduction='sum') / batch. On TPU the lattice runs as the fused
    Pallas forward-backward kernel (tpuasr.ops.ctc_pallas) by default."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from tpuasr.ops.ctc_pallas import ctc_loss_pallas

        nll = ctc_loss_pallas(lp, input_lens, labels, label_lens, blank,
                              interpret=jax.default_backend() != "tpu")
    else:
        nll = ctc_loss(lp, input_lens, labels, label_lens, blank)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "sum_over_batch":
        return jnp.sum(nll) / nll.shape[0]
    raise ValueError(reduction)
