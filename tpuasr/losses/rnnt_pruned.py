"""Pruned RNN-T: joint network + lattice restricted to a diagonal band of
`s_range` label positions per frame.

Parity target: the reference's k2 pruned path
(wenet/transducer/transducer.py:500-570 — rnnt_loss_smoothed ->
get_rnnt_prune_ranges -> do_rnnt_pruning -> rnnt_loss_pruned), which computes
the joint only on [B, T, s_range, V] instead of [B, T, U+1, V].

TPU-native simplification: k2 derives per-frame pruning bounds from the
gradients of a cheap "simple" joint; here the band follows the *linear
alignment prior* ``lo[t] = clip(round(t * U / T) - s_range/2)`` — monotonic,
shape-static, and needing no first pass. For speech (near-linear
audio/label alignment) the band covers the same mass once `s_range` spans
the alignment jitter; `s_range >= U+1` reproduces the exact full loss
(tested). Compute drops from O(T·U·V) to O(T·s·V), the win the reference
reserves for long-U workloads.

Gradients flow by autodiff through the banded scan (the band is O(T·s),
small enough that rematerialized activations are cheap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpuasr.losses.rnnt import _NEG, _linrec_scan, _logaddexp


def band_offsets(t_lens: jnp.ndarray, u_lens: jnp.ndarray, t: int,
                 s_range: int) -> jnp.ndarray:
    """lo [B, T]: first label index of each frame's band (monotonic,
    clipped so the band always covers u = u_len at the last valid frame)."""
    tt = jnp.arange(t)[None, :].astype(jnp.float32)
    tl = jnp.maximum(t_lens[:, None].astype(jnp.float32), 1.0)
    ul = u_lens[:, None].astype(jnp.float32)
    # clamp frame index to the valid range so padded frames keep the final band
    tt = jnp.minimum(tt, tl - 1.0)
    center = tt * (ul + 1.0) / tl
    lo = jnp.round(center - s_range / 2.0).astype(jnp.int32)
    hi_cap = jnp.maximum(u_lens[:, None] + 1 - s_range, 0)
    return jnp.clip(lo, 0, hi_cap)


@functools.partial(jax.jit, static_argnames=("blank", "s_range", "reduction"))
def rnnt_loss_pruned(
    enc_p: jnp.ndarray,  # [B, T, D] joint-projected encoder
    pred_p: jnp.ndarray,  # [B, U+1, D] joint-projected predictor
    w: jnp.ndarray,  # [D, V] joint head weight
    bias: jnp.ndarray,  # [V]
    labels: jnp.ndarray,  # [B, U]
    t_lens: jnp.ndarray,  # [B]
    u_lens: jnp.ndarray,  # [B]
    blank: int,
    s_range: int = 16,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Banded transducer loss; the [B, T, s_range, V] joint never touches
    the full U axis."""
    b, t, d = enc_p.shape
    u1 = pred_p.shape[1]
    s = min(s_range, u1)

    lo = band_offsets(t_lens, u_lens, t, s)  # [B, T]
    idx = lo[:, :, None] + jnp.arange(s)[None, None, :]  # [B, T, S] label pos u
    idx_c = jnp.minimum(idx, u1 - 1)

    # banded joint: tanh(enc + pred_band) @ w + bias -> log-softmax
    pred_band = jnp.take_along_axis(
        pred_p[:, None, :, :], idx_c[..., None], axis=2
    )  # [B, T, S, D]
    h = jnp.tanh(enc_p[:, :, None, :] + pred_band)
    logits = jnp.einsum("btsd,dv->btsv", h, w.astype(h.dtype)) + bias.astype(h.dtype)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    blank_lp = lp[..., blank]  # [B, T, S]
    # label id at each band slot (u = idx); pad one column so u = U gathers 0
    lab = jnp.take_along_axis(
        jnp.pad(labels.astype(jnp.int32), ((0, 0), (0, 1))),
        idx_c.reshape(b, -1), axis=1,
    ).reshape(b, t, s)
    label_lp = jnp.take_along_axis(lp, lab[..., None], axis=-1)[..., 0]  # [B, T, S]

    # validity / padding semantics (rnnt.py parity): padded frames get free
    # blanks; label transitions only where u < u_len and the frame is valid
    t_idx = jnp.arange(t)[None, :, None]
    pad_t = t_idx >= t_lens[:, None, None]
    in_band = idx <= u_lens[:, None, None]  # u position exists
    blank_lp = jnp.where(pad_t, 0.0, jnp.where(in_band, blank_lp, _NEG))
    label_ok = (idx < u_lens[:, None, None]) & ~pad_t
    label_lp = jnp.where(label_ok, label_lp, _NEG)

    # banded alpha recursion: alpha_t[s] = logaddexp(
    #   alpha_{t-1}[s + d_t] + blank_{t-1}[s + d_t],   (blank, band shifts d_t)
    #   alpha_t[s - 1] + label_t[s - 1])               (emit within frame)
    shift = jnp.diff(lo, axis=1, prepend=lo[:, :1])  # [B, T] d_t >= 0
    y = jnp.pad(label_lp, ((0, 0), (0, 0), (1, 0)), constant_values=_NEG)[:, :, :s]

    s_idx = jnp.arange(s)[None, :]
    base0 = jnp.where((lo[:, 0:1] == 0) & (s_idx == 0), 0.0, _NEG)
    alpha0 = _linrec_scan(base0, y[:, 0])

    def step(alpha_prev, inputs):
        blank_prev, y_t, d_t = inputs  # [B,S], [B,S], [B]
        src = s_idx + d_t[:, None]  # gather position in the previous band
        ok = src < s
        moved = jnp.take_along_axis(
            alpha_prev + blank_prev, jnp.minimum(src, s - 1), axis=1
        )
        base = jnp.where(ok, moved, _NEG)
        alpha_t = _linrec_scan(base, y_t)
        return alpha_t, None

    xs = (
        jnp.swapaxes(blank_lp, 0, 1)[:-1],
        jnp.swapaxes(y, 0, 1)[1:],
        jnp.swapaxes(shift, 0, 1)[1:],
    )
    alpha_last, _ = jax.lax.scan(step, alpha0, xs)

    # read the corner at u = u_len (band position u_len - lo[T-1]) + final blank
    corner_s = jnp.clip(u_lens - lo[:, -1], 0, s - 1)[:, None]
    corner = jnp.take_along_axis(alpha_last, corner_s, axis=1)[:, 0]
    last_blank = jnp.take_along_axis(blank_lp[:, -1], corner_s, axis=1)[:, 0]
    ll = corner + last_blank

    feasible = ll > _NEG / 2
    nll = jnp.where(feasible, -ll, 0.0)
    if reduction == "none":
        return nll
    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    raise ValueError(reduction)
