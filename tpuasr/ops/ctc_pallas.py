"""Pallas TPU kernel: CTC forward-backward lattice.

Replaces the recurrence half of `tpuasr.losses.ctc` (the TPU-native equivalent
of torch.nn.CTCLoss's native lattice, SURVEY §2.9): one kernel program per
batch tile keeps the alpha/beta state rows resident in VMEM across the whole
time loop, with the (s-1, s-2) lattice shifts as lane rolls — no HBM traffic
for intermediate lattice rows except the alpha/beta tapes needed for the
gradient, which are written once.

Forward computes alpha and the per-row log-likelihood; backward computes beta
and the exact gradient w.r.t. the per-state emission log-probs
(`lp_states` [B, T, S]); the label gather + log_softmax VJP upstream is left
to autodiff (it is a cheap scatter). Exposed through `ctc_loss_pallas` with
the same contract as `losses.ctc.ctc_loss`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuasr.losses.ctc import lattice_labels

_NEG = -1.0e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, _NEG)
    return m_safe + jnp.log1p(jnp.exp(jnp.minimum(a, b) - m_safe))


def _shift_right(x, k, fill=_NEG):
    """Shift along the last (lane) axis: out[..., s] = x[..., s-k]."""
    rolled = pltpu.roll(x, k, axis=x.ndim - 1)
    s_idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(s_idx >= k, rolled, fill)


def _shift_left(x, k, fill=_NEG):
    """out[..., s] = x[..., s+k]."""
    s = x.shape[-1]
    rolled = pltpu.roll(x, -k % s, axis=x.ndim - 1)
    s_idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(s_idx < s - k, rolled, fill)


def _alpha_kernel(lp_ref, skip_ref, tlen_ref, final_ref, alpha_ref, ll_ref):
    """lp [Bt, T, S] (masked emission logprobs), skip [Bt, S] (0/1 skip-trans
    allowed), tlen [Bt, 1], final [Bt, S] (one-hot-2 mask of final states) ->
    alpha tape [Bt, T, S], ll [Bt, 1]."""
    bt, t_max, s = lp_ref.shape
    skip = skip_ref[:] > 0
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (bt, s), 1)

    alpha0 = jnp.where(s_idx < 2, lp_ref[:, 0, :], _NEG)
    alpha_ref[:, 0, :] = alpha0

    def step(t, alpha):
        a1 = _shift_right(alpha, 1)
        a2 = jnp.where(skip, _shift_right(alpha, 2), _NEG)
        new = _logaddexp(_logaddexp(alpha, a1), a2) + lp_ref[:, t, :]
        active = t < tlen_ref[:]  # [Bt, 1]
        alpha = jnp.where(active, new, alpha)
        alpha_ref[:, t, :] = alpha
        return alpha

    alpha = jax.lax.fori_loop(1, t_max, step, alpha0)
    # ll = logsumexp over final states
    fin = jnp.where(final_ref[:] > 0, alpha, _NEG)
    m = jnp.maximum(jnp.max(fin, axis=1, keepdims=True), _NEG)
    ll_ref[:] = m + jnp.log(jnp.sum(jnp.exp(fin - m), axis=1, keepdims=True))


def _beta_grad_kernel(
    lp_ref, skip_ref, tlen_ref, final_ref, alpha_ref, ll_ref, g_ref, grad_ref
):
    """Backward: beta sweep fused with gradient emission.

    grad[t, s] = -g * exp(alpha[t, s] + beta_exclusive[t, s] - ll) where
    beta_exclusive excludes the emission at (t, s) (standard CTC posterior:
    occupancy gamma[t, s] = alpha[t, s] * beta_excl[t, s] / Z).
    """
    bt, t_max, s = lp_ref.shape
    skip = skip_ref[:] > 0
    # skip-shifted-left: transition s -> s+2 allowed iff skip[s+2]
    skip_l2 = _shift_left(jnp.where(skip, 0.0, _NEG), 2, fill=_NEG)

    # beta[t, s] defined to NOT include emission at (t, s):
    # beta[t, s] = logaddexp over next in {s, s+1, s+2}: lp[t+1(?)...]
    # We use beta'[t, s] = log P(suffix emissions from t..end | state s at t)
    # including emission at t: beta'[T-1, s] = lp[T-1, s] for final states.
    beta0 = jnp.where(final_ref[:] > 0, lp_ref[:, t_max - 1, :], _NEG)
    # rows with tlen < t_max handle activity masks in the loop

    def emit(t, beta_incl):
        # occupancy gamma[t, s] = alpha + beta_incl - lp (emission double
        # counted) - ll; d(ll)/d(lp[t, s]) = exp(gamma)
        lp_t = lp_ref[:, t, :]
        gamma = alpha_ref[:, t, :] + (beta_incl - lp_t) - ll_ref[:]
        active = t < tlen_ref[:]  # [Bt, 1] — padded frames get zero grad
        grad_ref[:, t, :] = jnp.where(
            active, g_ref[:] * jnp.exp(jnp.minimum(gamma, 0.0)), 0.0
        )

    emit(t_max - 1, beta0)

    def step(i, beta):
        t = t_max - 2 - i
        b1 = _shift_left(beta, 1)
        b2 = jnp.where(skip_l2 > _NEG / 2, _shift_left(beta, 2), _NEG)
        new = _logaddexp(_logaddexp(beta, b1), b2) + lp_ref[:, t, :]
        # freeze rows that already ended: for t >= tlen-1, beta restarts at the
        # final-state init (their lattice ends at tlen-1)
        is_last = (t == tlen_ref[:] - 1)
        init_row = jnp.where(final_ref[:] > 0, lp_ref[:, t, :], _NEG)
        new = jnp.where(is_last, init_row, new)
        ended = t >= tlen_ref[:]
        new = jnp.where(ended, beta, new)
        emit(t, new)
        return new

    jax.lax.fori_loop(0, t_max - 1, step, beta0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _ctc_lattice_pallas(lp_states, skip, tlens, final, interpret):
    ll, _ = _ctc_forward(lp_states, skip, tlens, final, interpret)
    return ll


def _ctc_forward(lp_states, skip, tlens, final, interpret):
    b, t, s = lp_states.shape
    s_pad = _round_up(s, 128)
    bt = 8
    b_pad = _round_up(b, bt)
    lp = jnp.pad(lp_states, ((0, b_pad - b), (0, 0), (0, s_pad - s)),
                 constant_values=_NEG)
    skip_p = jnp.pad(skip.astype(jnp.float32), ((0, b_pad - b), (0, s_pad - s)))
    final_p = jnp.pad(final.astype(jnp.float32), ((0, b_pad - b), (0, s_pad - s)))
    tl = jnp.pad(tlens.astype(jnp.int32), (0, b_pad - b), constant_values=1)[:, None]

    grid = (b_pad // bt,)
    alpha, ll = pl.pallas_call(
        _alpha_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, t, s_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, t, s_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, s_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, s_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bt, t, s_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(lp, skip_p, tl, final_p)
    return ll[:b, 0], (lp, skip_p, tl, final_p, alpha, ll, (b, t, s, s_pad, b_pad, bt))


def _ctc_fwd(lp_states, skip, tlens, final, interpret):
    ll, res = _ctc_forward(lp_states, skip, tlens, final, interpret)
    return ll, res


def _ctc_bwd(interpret, res, g):
    lp, skip_p, tl, final_p, alpha, ll, (b, t, s, s_pad, b_pad, bt) = res
    g_p = jnp.pad(g.astype(jnp.float32), (0, b_pad - b))[:, None]

    grid = (b_pad // bt,)
    grad = pl.pallas_call(
        _beta_grad_kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, t, s_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, t, s_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, s_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, s_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, t, s_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, t, s_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lp, skip_p, tl, final_p, alpha, ll, g_p)
    # the kernel emits g * d(ll)/d(lp); the caller's nll = -ll carries the sign
    return (grad[:b, :, :s], None, None, None)


_ctc_lattice_pallas.defvjp(_ctc_fwd, _ctc_bwd)


@functools.partial(jax.jit, static_argnames=("blank", "interpret"))
def ctc_loss_pallas(
    log_probs: jnp.ndarray,  # [B, T, V] log-softmaxed
    input_lens: jnp.ndarray,
    labels: jnp.ndarray,
    label_lens: jnp.ndarray,
    blank: int = 0,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Drop-in replacement for losses.ctc.ctc_loss on TPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, v = log_probs.shape
    u = labels.shape[1]
    s = 2 * u + 1

    lab = lattice_labels(labels, blank)
    state_idx = jnp.arange(s)[None, :]
    state_valid = state_idx <= 2 * label_lens[:, None]
    lp_states = jnp.take_along_axis(log_probs, lab[:, None, :].astype(jnp.int32), axis=2)
    lp_states = jnp.where(state_valid[:, None, :], lp_states, _NEG)

    lab_m2 = jnp.pad(lab, ((0, 0), (2, 0)), constant_values=blank)[:, :s]
    can_skip = (lab != blank) & (lab != lab_m2) & (state_idx >= 2)

    final = (state_idx == 2 * label_lens[:, None]) | (
        (state_idx == 2 * label_lens[:, None] - 1) & (label_lens[:, None] > 0)
    )

    ll = _ctc_lattice_pallas(lp_states, can_skip, input_lens, final, interpret)
    nll = -ll
    feasible = ll > _NEG / 2
    return jnp.where(feasible, nll, jax.lax.stop_gradient(nll) * 0.0)
