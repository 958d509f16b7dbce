"""Fused joint-network + RNN-T loss Pallas kernels.

The [B, T, U, V] joint tensor is the transducer training memory hot spot
(SURVEY §3.2 ★ — at production scale T·U·V exceeds HBM, which is why
BASELINE.json's north star wants it sharded). This module removes the tensor
entirely: the joint head (`ffn_out(tanh(enc_p + pred_p))`), the log-softmax,
and the blank/label gathers are fused into one Pallas kernel that streams
(t-tile, U) blocks through VMEM and writes only the two [B, T, U+1] lattice
inputs — HBM traffic drops by a factor of V (~400x for the pinyin vocab).

The backward kernel rematerializes each tile's logits and emits the exact
gradients (d_enc_p, d_pred_p, dW, db) from the alpha/beta occupancies, so the
full [B, T, U, V] gradient tensor never exists either; dW/db accumulate
across the sequential grid steps.

Forward lattice (alphas/betas) runs on the [B, T, U] outputs via the existing
log-semiring associative scans (tpuasr.losses.rnnt).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuasr.losses.rnnt import rnnt_alphas, rnnt_betas

_NEG = -1.0e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fused_fwd_kernel(enc_ref, pred_ref, w_ref, b_ref, lab_ref,
                      blank_ref, label_ref, *, blank_id: int, u1: int):
    """One (batch row, t-tile) step.

    enc [1, Tt, D], pred [1, U1p, D], w [D, Vp], b [1, Vp], lab [1, U1p] ->
    blank_lp [1, Tt, U1o], label_lp [1, Tt, U1o] (U1o = U1p padded to lanes).
    """
    _, tt, d = enc_ref.shape
    u1p = pred_ref.shape[1]
    vp = w_ref.shape[1]

    joined = enc_ref[0][:, None, :] + pred_ref[0][None, :, :]  # [Tt, U1p, D]
    a = jnp.tanh(joined.reshape(tt * u1p, d).astype(jnp.float32))
    x = (
        jnp.dot(a, w_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)
        + b_ref[:]
    )  # [Tt*U1p, Vp]

    m = jnp.max(x, axis=-1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(x - m), axis=-1, keepdims=True))  # [N, 1]

    v_iota = jax.lax.broadcasted_iota(jnp.int32, (tt * u1p, vp), 1)
    blank_x = jnp.sum(jnp.where(v_iota == blank_id, x, 0.0), axis=-1, keepdims=True)
    oh = jnp.tile(lab_ref[0], (tt, 1))  # [N, Vp] label one-hot
    label_x = jnp.sum(jnp.where(oh > 0, x, 0.0), axis=-1, keepdims=True)

    blank_lp = (blank_x - lse).reshape(tt, u1p)
    label_lp = (label_x - lse).reshape(tt, u1p)
    u1o = blank_ref.shape[2]
    blank_ref[0] = jnp.pad(blank_lp, ((0, 0), (0, u1o - u1p)))
    label_ref[0] = jnp.pad(label_lp, ((0, 0), (0, u1o - u1p)))


def _fused_bwd_kernel(enc_ref, pred_ref, w_ref, b_ref, lab_ref,
                      gb_ref, gl_ref,
                      denc_ref, dpred_ref, dw_ref, db_ref,
                      *, blank_id: int):
    """Gradient step for one (batch row, t-tile).

    gb/gl: upstream grads w.r.t. blank_lp/label_lp [Tt, U1o].
    Outputs: denc [1, Tt, D]; dpred [1, U1p, D], dw [D, Vp], db [1, Vp]
    accumulated across grid steps (sequential on-core).
    """
    _, tt, d = enc_ref.shape
    u1p = pred_ref.shape[1]
    vp = w_ref.shape[1]
    ti = pl.program_id(1)
    bi = pl.program_id(0)

    @pl.when((bi == 0) & (ti == 0))
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    @pl.when(ti == 0)
    def _init_pred():
        dpred_ref[:] = jnp.zeros_like(dpred_ref)

    joined = enc_ref[0][:, None, :] + pred_ref[0][None, :, :]
    a = jnp.tanh(joined.reshape(tt * u1p, d).astype(jnp.float32))
    x = (
        jnp.dot(a, w_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)
        + b_ref[:]
    )
    m = jnp.max(x, axis=-1, keepdims=True)
    ex = jnp.exp(x - m)
    sm = (ex / jnp.sum(ex, axis=-1, keepdims=True)).reshape(tt, u1p, vp)

    gb = gb_ref[0][:, :u1p]  # [Tt, U1p]
    gl = gl_ref[0][:, :u1p]
    v_iota = jax.lax.broadcasted_iota(jnp.int32, (tt, u1p, vp), 2)
    oh = jnp.broadcast_to(lab_ref[0][None, :, :], (tt, u1p, vp))
    # d blank_lp/d x_v = 1[v=blank] - sm_v (log-softmax vjp), likewise label:
    # dX = gb * 1[v=blank] + gl * 1[v=label_u] - sm * (gb + gl)
    dx3 = -sm * (gb + gl)[..., None]
    dx3 = dx3 + jnp.where(v_iota == blank_id, gb[..., None], 0.0)
    dx3 = dx3 + jnp.where(oh > 0, gl[..., None], 0.0)
    dx = dx3.reshape(tt * u1p, vp)

    da = jnp.dot(dx, w_ref[:].astype(jnp.float32).T, preferred_element_type=jnp.float32)
    djoined = (da * (1.0 - a * a)).reshape(tt, u1p, d)

    denc_ref[0] = jnp.sum(djoined, axis=1).astype(denc_ref.dtype)
    dpred_ref[0] += jnp.sum(djoined, axis=0).astype(dpred_ref.dtype)
    dw_ref[:] += jnp.dot(a.T, dx, preferred_element_type=jnp.float32)
    db_ref[:] += jnp.sum(dx, axis=0, keepdims=True)


def _pad_operands(enc_p, pred_p, w, b, labels, blank_id):
    bsz, t, d = enc_p.shape
    u1 = pred_p.shape[1]
    v = w.shape[1]
    u1p_est = _round_up(u1, 8)
    # tile size: keep the per-step [tt*U1p, Vp] logits block ~2MB so the MXU
    # sees large matmuls with few grid steps
    tt = max(8, min(64, 1024 // u1p_est * 8))
    t_pad = _round_up(t, tt)
    u1p = u1p_est
    u1o = _round_up(u1p, 128)
    vp = _round_up(v, 128)

    enc = jnp.pad(enc_p.astype(jnp.float32), ((0, 0), (0, t_pad - t), (0, 0)))
    pred = jnp.pad(pred_p.astype(jnp.float32), ((0, 0), (0, u1p - u1), (0, 0)))
    wp = jnp.pad(w.astype(jnp.float32), ((0, 0), (0, vp - v)), constant_values=0.0)
    # padded vocab columns get -inf bias so they never affect the logsumexp
    bp = jnp.pad(b.astype(jnp.float32), (0, vp - v), constant_values=_NEG)[None, :]
    # label of column u is labels[u] (u < U), as a one-hot over the padded
    # vocab (gathers become masked reductions — Mosaic-friendly); pad columns
    # point at the blank (their lattice entries are masked outside anyway)
    lab_ids = jnp.pad(labels.astype(jnp.int32), ((0, 0), (0, u1p - labels.shape[1])),
                      constant_values=blank_id)
    lab = jax.nn.one_hot(lab_ids, vp, dtype=jnp.float32)  # [B, U1p, Vp]
    return enc, pred, wp, bp, lab, (bsz, t, d, u1, v, tt, t_pad, u1p, u1o, vp)


def _fused_lp(enc_p, pred_p, w, b, labels, blank_id, interpret):
    enc, pred, wp, bp, lab, dims = _pad_operands(enc_p, pred_p, w, b, labels, blank_id)
    bsz, t, d, u1, v, tt, t_pad, u1p, u1o, vp = dims
    grid = (bsz, t_pad // tt)
    blank_lp, label_lp = pl.pallas_call(
        functools.partial(_fused_fwd_kernel, blank_id=blank_id, u1=u1),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, t_pad, u1o), jnp.float32),
            jax.ShapeDtypeStruct((bsz, t_pad, u1o), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tt, d), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, u1p, d), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, vp), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vp), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, u1p, vp), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tt, u1o), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tt, u1o), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(enc, pred, wp, bp, lab)
    return blank_lp[:, :t, :u1], label_lp[:, :t, :u1]


def _fused_grads(enc_p, pred_p, w, b, labels, gb, gl, blank_id, interpret):
    enc, pred, wp, bp, lab, dims = _pad_operands(enc_p, pred_p, w, b, labels, blank_id)
    bsz, t, d, u1, v, tt, t_pad, u1p, u1o, vp = dims
    gb_p = jnp.pad(gb, ((0, 0), (0, t_pad - t), (0, u1o - u1)))
    gl_p = jnp.pad(gl, ((0, 0), (0, t_pad - t), (0, u1o - u1)))
    grid = (bsz, t_pad // tt)
    denc, dpred, dw, db = pl.pallas_call(
        functools.partial(_fused_bwd_kernel, blank_id=blank_id),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, t_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((bsz, u1p, d), jnp.float32),
            jax.ShapeDtypeStruct((d, vp), jnp.float32),
            jax.ShapeDtypeStruct((1, vp), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tt, d), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, u1p, d), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, vp), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vp), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, u1p, vp), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tt, u1o), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tt, u1o), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tt, d), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, u1p, d), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, vp), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vp), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(enc, pred, wp, bp, lab, gb_p, gl_p)
    return (
        denc[:, :t],
        dpred[:, :u1],
        dw[:, :v],
        db[0, :v],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def rnnt_loss_fused(enc_p, pred_p, w, b, labels, t_lens, u_lens, _unused,
                    blank_id: int, interpret: bool):
    nll, _ = _fused_fwd(enc_p, pred_p, w, b, labels, t_lens, u_lens, _unused,
                        blank_id, interpret)
    return nll


def _mask_lps(blank_lp, label_lp_full, t_lens, u_lens):
    bsz, t, u1 = blank_lp.shape
    u = u1 - 1
    label_lp = label_lp_full[:, :, :u]
    t_idx = jnp.arange(t)[None, :, None]
    pad_t = t_idx >= t_lens[:, None, None]
    blank_m = jnp.where(pad_t, 0.0, blank_lp)
    u_idx = jnp.arange(u)[None, None, :]
    label_valid = (u_idx < u_lens[:, None, None]) & ~pad_t
    label_m = jnp.where(label_valid, label_lp, _NEG)
    return blank_m, label_m, pad_t, label_valid


def _fused_fwd(enc_p, pred_p, w, b, labels, t_lens, u_lens, _unused,
               blank_id, interpret):
    blank_lp, label_lp_full = _fused_lp(enc_p, pred_p, w, b, labels, blank_id,
                                        interpret)
    blank_m, label_m, pad_t, label_valid = _mask_lps(
        blank_lp, label_lp_full, t_lens, u_lens
    )
    alpha = rnnt_alphas(blank_m, label_m)
    corner = jnp.take_along_axis(alpha[:, -1, :], u_lens[:, None], axis=1)[:, 0]
    last_blank = jnp.take_along_axis(blank_m[:, -1, :], u_lens[:, None], axis=1)[:, 0]
    ll = corner + last_blank
    feasible = ll > _NEG / 2
    nll = jnp.where(feasible, -ll, 0.0)
    res = (enc_p, pred_p, w, b, labels, t_lens, u_lens, blank_m, label_m, ll, feasible)
    return nll, res


def _fused_bwd(blank_id, interpret, res, g):
    enc_p, pred_p, w, b, labels, t_lens, u_lens, blank_m, label_m, ll, feasible = res
    bsz, t, u1 = blank_m.shape
    g = jnp.where(feasible, g, 0.0)
    beta = rnnt_betas(blank_m, label_m, u_lens)
    u_idx = jnp.arange(u1)[None, None, :]
    beta_tp1 = jnp.concatenate([beta[:, 1:], jnp.full((bsz, 1, u1), _NEG)], axis=1)
    term = (u_idx == u_lens[:, None, None]) & (
        jnp.arange(t)[None, :, None] == t - 1
    )
    beta_tp1 = jnp.where(term, 0.0, beta_tp1)
    alpha = rnnt_alphas(blank_m, label_m)
    occ_blank = jnp.exp(jnp.minimum(alpha + blank_m + beta_tp1 - ll[:, None, None], 0.0))
    occ_label = jnp.exp(jnp.minimum(
        alpha[:, :, :-1] + label_m + beta[:, :, 1:] - ll[:, None, None], 0.0))

    # d(nll)/d(raw lp) = -occ on unmasked entries, 0 on padding
    t_idx = jnp.arange(t)[None, :, None]
    pad_t = t_idx >= t_lens[:, None, None]
    gb = jnp.where(pad_t, 0.0, -g[:, None, None] * occ_blank)
    u_idx_l = jnp.arange(u1 - 1)[None, None, :]
    lv = (u_idx_l < u_lens[:, None, None]) & ~pad_t
    gl = jnp.where(lv, -g[:, None, None] * occ_label, 0.0)
    gl = jnp.pad(gl, ((0, 0), (0, 0), (0, 1)))  # column U has no label grad

    denc, dpred, dw, db = _fused_grads(
        enc_p, pred_p, w, b, labels, gb, gl, blank_id, interpret
    )
    return (
        denc.astype(enc_p.dtype), dpred.astype(pred_p.dtype),
        dw.astype(w.dtype), db.astype(b.dtype),
        None, None, None, None,
    )


rnnt_loss_fused.defvjp(_fused_fwd, _fused_bwd)


def rnnt_loss_fused_mean(
    enc_p: jnp.ndarray,  # [B, T, D] pre-join projected encoder output
    pred_p: jnp.ndarray,  # [B, U+1, D] pre-join projected predictor output
    w: jnp.ndarray,  # [D, V] joint output kernel
    b: jnp.ndarray,  # [V] joint output bias
    labels: jnp.ndarray,  # [B, U]
    t_lens: jnp.ndarray,
    u_lens: jnp.ndarray,
    blank_id: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Mean-reduced fused transducer loss (tanh additive joint)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nll = rnnt_loss_fused(enc_p, pred_p, w, b, labels, t_lens, u_lens, None,
                          blank_id, interpret)
    return jnp.mean(nll)
