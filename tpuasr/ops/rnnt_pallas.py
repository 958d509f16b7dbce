"""Pallas TPU kernel: RNN-T transducer lattice (alphas/betas + exact grads).

The TPU-native replacement for torchaudio's native transducer loss
(SURVEY §2.9): one kernel program per batch tile runs the whole (T, U)
lattice with the alpha/beta rows resident in VMEM. The per-frame
U-recurrence ``x_u = logaddexp(base_u, x_{u-1} + gain_u)`` is solved with an
in-kernel Hillis-Steele doubling scan in the (logaddexp, +) semiring
(log2(U) lane-roll steps per frame instead of a U-step serial chain); the
backward kernel fuses the beta sweep with occupancy-gradient emission so the
backward pass costs one more lattice sweep and no extra HBM round-trips.

Contract identical to `tpuasr.losses.rnnt.rnnt_loss` (same free-blank padding
trick, applied by the wrapper before the kernel boundary so padded logits get
zero gradient via the masking VJP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1.0e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, _NEG)
    return m_safe + jnp.log1p(jnp.exp(jnp.minimum(a, b) - m_safe))


def _shift_right(x, k, fill):
    rolled = pltpu.roll(x, k, axis=x.ndim - 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(idx >= k, rolled, fill)


def _shift_left(x, k, fill):
    s = x.shape[-1]
    rolled = pltpu.roll(x, (-k) % s, axis=x.ndim - 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(idx < s - k, rolled, fill)


def _linrec_fwd(base, gain):
    """x_u = logaddexp(base_u, x_{u-1} + gain_u); Hillis-Steele doubling.

    Segment combine: (A1,B1)∘(A2,B2) = (A1+A2, logaddexp(B1+A2, B2)) where
    segment 1 is to the LEFT of segment 2.
    """
    a, b = gain, base
    d = 1
    u = base.shape[-1]
    while d < u:
        a_s = _shift_right(a, d, 0.0)
        b_s = _shift_right(b, d, _NEG)
        b = _logaddexp(b_s + a, b)
        a = a_s + a
        d *= 2
    return b


def _linrec_rev(base, gain):
    """x_u = logaddexp(base_u, x_{u+1} + gain_u).

    Segment combine (segment 1 LEFT of segment 2, dependency flows right→left):
    (A1,B1)∘(A2,B2) = (A1+A2, logaddexp(B1, A1+B2)).
    """
    a, b = gain, base
    d = 1
    u = base.shape[-1]
    while d < u:
        a_s = _shift_left(a, d, 0.0)
        b_s = _shift_left(b, d, _NEG)
        b = _logaddexp(b, a + b_s)
        a = a + a_s
        d *= 2
    return b


def _alpha_kernel(blank_ref, label_ref, ulen_ref, alpha_ref, ll_ref):
    """blank [Bt, T, U1p], label [Bt, T, U1p] (label gain at column u =
    label_lp[t, u-1], i.e. pre-shifted by the wrapper), ulen [Bt, 1] ->
    alpha tape [Bt, T, U1p], ll [Bt, 1]."""
    bt, t_max, u1p = blank_ref.shape
    u_idx = jax.lax.broadcasted_iota(jnp.int32, (bt, u1p), 1)

    base0 = jnp.where(u_idx == 0, 0.0, _NEG)
    alpha = _linrec_fwd(base0, label_ref[:, 0, :])
    alpha_ref[:, 0, :] = alpha

    def step(t, alpha):
        base = alpha + blank_ref[:, t - 1, :]
        alpha = _linrec_fwd(base, label_ref[:, t, :])
        alpha_ref[:, t, :] = alpha
        return alpha

    alpha = jax.lax.fori_loop(1, t_max, step, alpha)

    corner = jnp.where(u_idx == ulen_ref[:], alpha + blank_ref[:, t_max - 1, :], _NEG)
    ll_ref[:] = jnp.max(corner, axis=1, keepdims=True)


def _beta_grad_kernel(
    blank_ref, label_ref, ulen_ref, alpha_ref, ll_ref, g_ref,
    gblank_ref, glabel_ref,
):
    """Reverse sweep: beta rows + occupancy gradients.

    label gain here at column u = label_lp[t, u] (NOT shifted — the wrapper
    passes both layouts).
    """
    bt, t_max, u1p = blank_ref.shape
    u_idx = jax.lax.broadcasted_iota(jnp.int32, (bt, u1p), 1)
    terminal = u_idx == ulen_ref[:]

    def emit(t, beta_tp1, beta_t):
        a = alpha_ref[:, t, :]
        gb = a + blank_ref[:, t, :] + beta_tp1 - ll_ref[:]
        gl = a + label_ref[:, t, :] + _shift_left(beta_t, 1, _NEG) - ll_ref[:]
        scale = g_ref[:]
        gblank_ref[:, t, :] = scale * jnp.exp(jnp.minimum(gb, 0.0))
        glabel_ref[:, t, :] = scale * jnp.exp(jnp.minimum(gl, 0.0))

    beta_tp1 = jnp.where(terminal, 0.0, _NEG)
    base = blank_ref[:, t_max - 1, :] + beta_tp1
    beta = _linrec_rev(base, label_ref[:, t_max - 1, :])
    emit(t_max - 1, beta_tp1, beta)

    def step(i, beta):
        t = t_max - 2 - i
        base = blank_ref[:, t, :] + beta
        new_beta = _linrec_rev(base, label_ref[:, t, :])
        emit(t, beta, new_beta)
        return new_beta

    jax.lax.fori_loop(0, t_max - 1, step, beta)


def _pad_inputs(blank_lp, label_lp, u_lens):
    b, t, u1 = blank_lp.shape
    u1p = _round_up(u1, 128)
    bt = 8 if t * u1p <= 64 * 1024 else 4
    b_pad = _round_up(b, bt)
    blank_p = jnp.pad(
        blank_lp, ((0, b_pad - b), (0, 0), (0, u1p - u1)), constant_values=_NEG
    )
    # gain layout for the forward scan: gain[u] = label_lp[t, u-1]
    label_gain_fwd = jnp.pad(
        label_lp, ((0, b_pad - b), (0, 0), (1, u1p - u1)), constant_values=_NEG
    )
    # gain layout for the backward scan: gain[u] = label_lp[t, u]
    label_gain_rev = jnp.pad(
        label_lp, ((0, b_pad - b), (0, 0), (0, u1p - u1 + 1)), constant_values=_NEG
    )[:, :, :u1p]
    ul = jnp.pad(u_lens.astype(jnp.int32), (0, b_pad - b))[:, None]
    return blank_p, label_gain_fwd, label_gain_rev, ul, (b, t, u1, u1p, b_pad, bt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _rnnt_lattice_pallas(blank_lp, label_lp, u_lens, interpret):
    ll, _ = _rnnt_forward(blank_lp, label_lp, u_lens, interpret)
    return ll


def _rnnt_forward(blank_lp, label_lp, u_lens, interpret):
    blank_p, gain_fwd, gain_rev, ul, dims = _pad_inputs(blank_lp, label_lp, u_lens)
    b, t, u1, u1p, b_pad, bt = dims
    grid = (b_pad // bt,)
    spec3 = lambda: pl.BlockSpec((bt, t, u1p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    spec1 = lambda: pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    alpha, ll = pl.pallas_call(
        _alpha_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, t, u1p), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[spec3(), spec3(), spec1()],
        out_specs=(spec3(), spec1()),
        interpret=interpret,
    )(blank_p, gain_fwd, ul)
    return ll[:b, 0], (blank_p, gain_rev, ul, alpha, ll, dims)


def _rnnt_fwd(blank_lp, label_lp, u_lens, interpret):
    return _rnnt_forward(blank_lp, label_lp, u_lens, interpret)


def _rnnt_bwd(interpret, res, g):
    blank_p, gain_rev, ul, alpha, ll, dims = res
    b, t, u1, u1p, b_pad, bt = dims
    g_p = jnp.pad(g.astype(jnp.float32), (0, b_pad - b))[:, None]
    grid = (b_pad // bt,)
    spec3 = lambda: pl.BlockSpec((bt, t, u1p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    spec1 = lambda: pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    gblank, glabel = pl.pallas_call(
        _beta_grad_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, t, u1p), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, t, u1p), jnp.float32),
        ),
        grid=grid,
        in_specs=[spec3(), spec3(), spec1(), spec3(), spec1(), spec1()],
        out_specs=(spec3(), spec3()),
        interpret=interpret,
    )(blank_p, gain_rev, ul, alpha, ll, g_p)
    return gblank[:b, :, :u1], glabel[:b, :, : u1 - 1], None


_rnnt_lattice_pallas.defvjp(_rnnt_fwd, _rnnt_bwd)


@functools.partial(jax.jit, static_argnames=("blank", "interpret"))
def rnnt_loss_pallas(
    log_probs: jnp.ndarray,  # [B, T, U+1, V] log-softmaxed
    labels: jnp.ndarray,
    t_lens: jnp.ndarray,
    u_lens: jnp.ndarray,
    blank: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Drop-in replacement for losses.rnnt.rnnt_loss on TPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, u1, v = log_probs.shape
    u = u1 - 1
    blank_lp = log_probs[..., blank]
    label_lp = jnp.take_along_axis(
        log_probs[:, :, :u, :], labels[:, None, :, None].astype(jnp.int32), axis=3
    )[..., 0]

    t_idx = jnp.arange(t)[None, :, None]
    pad_t = t_idx >= t_lens[:, None, None]
    blank_lp = jnp.where(pad_t, 0.0, blank_lp)
    u_idx = jnp.arange(u)[None, None, :]
    label_valid = (u_idx < u_lens[:, None, None]) & ~pad_t
    label_lp = jnp.where(label_valid, label_lp, _NEG)

    ll = _rnnt_lattice_pallas(blank_lp, label_lp, u_lens, interpret)
    nll = -ll
    feasible = ll > _NEG / 2
    return jnp.where(feasible, nll, jax.lax.stop_gradient(nll) * 0.0)
