"""Fused rel-pos self-attention (scores + chunk mask + softmax + AV) for TPU.

The conformer's rel-pos attention (wenet attention.py:286-438 semantics, no
rel_shift) computes, per (batch, head):

    scores = ((q + u) @ k^T + (q + v) @ p^T) / sqrt(dk)
    attn   = where(mask, softmax(where(mask, scores, -1e9)), 0)
    out    = attn @ v

The unfused path writes `scores`/`attn` ([B, H, T, S] fp32) to HBM several
times per layer; at the flagship shape that traffic dominates attention's
device time (~2.0 ms of the 11.8 ms round-2 step across 12 layers fwd+bwd).
This kernel keeps the whole score matrix in VMEM — T and S are encoder-frame
counts (a few hundred), so no flash-style streaming is needed — and a
custom_vjp recomputes it in the backward kernel instead of saving it.

Layout: everything stays in the module's natural [B, T, H*dk] layout (heads
are lane slices inside the kernel), so the wrapper adds NO transposes, and
the u/v bias adds, the dq = dqu + dqv merge, and the bias/positional
gradient reductions all happen in VMEM. The positional projection p is
[1, S, H*dk] (training-path pos_emb is batch-broadcast); its gradient and
the u/v bias gradients accumulate across the sequential (B,) grid.

Numerics: scores/softmax in fp32 regardless of the bf16 compute dtype.
Attention dropout is not supported — callers keep the unfused path when
attention_dropout_rate > 0 (the reference protocol uses 0.0,
rnnt_common.py / model/online_rnnt_model.py:85-107).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1.0e9


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    rem = (-size) % mult
    if rem == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return jnp.pad(x, pads)


def _head_attn(q, k, p, v, ub, vb, m, scale):
    """One head in VMEM: q [T, dk]; k/p/v [S, dk]; ub/vb [1, dk]; m [T, S].

    MXU shape note: dk = 64 on the flagship (4 heads x 64 of d=256), so
    separate (q+u)@k^T and (q+v)@p^T matmuls contract over only half the
    MXU's 128 lanes. Concatenating the two score terms along the feature
    axis — [qu|qv] [T, 2dk] @ [k|p]^T [2dk, S] — computes their SUM in one
    full-width contraction: same FLOPs, ~2x MXU utilization on the score
    matmul (the largest in the kernel). Exactness: identical sum, fp32
    accumulate either way."""
    qu = q + ub
    qv = q + vb
    quv = jnp.concatenate([qu, qv], axis=1)      # [T, 2dk]
    kp = jnp.concatenate([k, p], axis=1)         # [S, 2dk]
    s = jnp.dot(quv, kp.T, preferred_element_type=jnp.float32)
    s = jnp.where(m, s * scale, _NEG_INF)
    a = jax.nn.softmax(s, axis=-1)
    return jnp.where(m, a, 0.0), qu, qv


def _fwd_kernel(q_ref, k_ref, p_ref, v_ref, u_ref, vb_ref, mask_ref, o_ref,
                *, scale, n_head, dk):
    m = mask_ref[0]
    for h in range(n_head):
        sl = slice(h * dk, (h + 1) * dk)
        a, _, _ = _head_attn(
            q_ref[0, :, sl], k_ref[0, :, sl], p_ref[0, :, sl],
            v_ref[0, :, sl], u_ref[0:1, sl], vb_ref[0:1, sl], m, scale,
        )
        v = v_ref[0, :, sl]
        o_ref[0, :, sl] = jnp.dot(
            a.astype(v.dtype), v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, p_ref, v_ref, u_ref, vb_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dp_ref, du_ref, dvb_ref,
                *, scale, n_head, dk):
    b = pl.program_id(0)
    m = mask_ref[0]

    @pl.when(b == 0)
    def _init():
        dp_ref[...] = jnp.zeros_like(dp_ref)
        du_ref[...] = jnp.zeros_like(du_ref)
        dvb_ref[...] = jnp.zeros_like(dvb_ref)

    for h in range(n_head):
        sl = slice(h * dk, (h + 1) * dk)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        p = p_ref[0, :, sl]
        v = v_ref[0, :, sl]
        do = do_ref[0, :, sl].astype(jnp.float32)

        a, qu, qv = _head_attn(q, k, p, v, u_ref[0:1, sl], vb_ref[0:1, sl], m, scale)

        dv_ref[0, :, sl] = jnp.dot(
            a.T, do, preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        da = jnp.dot(do, v.astype(jnp.float32).T,
                     preferred_element_type=jnp.float32)
        da = jnp.where(m, da, 0.0)
        ds = a * (da - jnp.sum(da * a, axis=-1, keepdims=True)) * scale
        dsc = ds.astype(k.dtype)

        # dqu = ds@k, dqv = ds@p -> dq = ds@(k + p) in one matmul
        dq_ref[0, :, sl] = jnp.dot(
            dsc, (k + p), preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        # dk = ds^T@qu and dp = ds^T@qv share the ds^T operand: one matmul
        # against [qu|qv] doubles the output lanes (64 -> 128) like the
        # forward's score concat — same FLOPs, full MXU width
        dkdp = jnp.dot(dsc.T, jnp.concatenate([qu, qv], axis=1),
                       preferred_element_type=jnp.float32)
        dk_ref[0, :, sl] = dkdp[:, :dk].astype(dk_ref.dtype)
        dp_ref[0, :, sl] += dkdp[:, dk:].astype(dp_ref.dtype)
        # bias grads: du = sum_t dqu = (sum_t ds) @ k (a [1, S] x [S, dk] dot)
        col = jnp.sum(ds, axis=0, keepdims=True).astype(k.dtype)  # [1, S]
        du_ref[:, sl] += jnp.dot(
            col, k, preferred_element_type=jnp.float32).astype(du_ref.dtype)
        dvb_ref[:, sl] += jnp.dot(
            col, p, preferred_element_type=jnp.float32).astype(dvb_ref.dtype)


def _interpret():
    return jax.default_backend() == "cpu"


def _specs(t, s, d):
    xspec = pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((1, s, d), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((8, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, t, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return xspec, kspec, pspec, bspec, mspec


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_relpos_attention(q, k, p, v, u_bias, v_bias, mask, scale, n_head):
    """-> [B, T, D]. q: [B, T, D]; k/v: [B, S, D]; p: [1, S, D] (projected
    key-position PE, batch-shared); u_bias/v_bias: [D] (per-head lane
    slices); mask: [B|1, T|1, S] bool True=attend; scale = 1/sqrt(dk)."""
    out, _ = _fused_fwd(q, k, p, v, u_bias, v_bias, mask, scale, n_head)
    return out


def _prep(q, k, p, v, u_bias, v_bias, mask):
    b, t0, d = q.shape
    s0 = k.shape[1]
    mult = 16  # bf16 sublane tile
    q = _pad_to(q, 1, mult)
    k, p, v = _pad_to(k, 1, mult), _pad_to(p, 1, mult), _pad_to(v, 1, mult)
    mask = jnp.broadcast_to(mask, (b, t0, s0))
    mask = _pad_to(_pad_to(mask, 1, mult), 2, mult)  # padded slots: False
    # biases as [8, D] tiles (row 0 used; 8 = f32 sublane minimum)
    ub = jnp.broadcast_to(u_bias[None, :], (8, d))
    vb = jnp.broadcast_to(v_bias[None, :], (8, d))
    return q, k, p, v, ub, vb, mask, t0, s0


def _fused_fwd(q, k, p, v, u_bias, v_bias, mask, scale, n_head):
    assert p.shape[0] == 1, "fused path expects batch-shared positional emb"
    b, _, d = q.shape
    dk = d // n_head
    qp, kp, pp, vp, ub, vb, mp = _prep(q, k, p, v, u_bias, v_bias, mask)[:7]
    t0 = q.shape[1]
    t, s = qp.shape[1], kp.shape[1]

    xspec, kspec, pspec, bspec, mspec = _specs(t, s, d)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_head=n_head, dk=dk),
        grid=(b,),
        in_specs=[xspec, kspec, pspec, kspec, bspec, bspec, mspec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, t, d), q.dtype),
        interpret=_interpret(),
    )(qp, kp, pp, vp, ub, vb, mp)
    return out[:, :t0], (qp, kp, pp, vp, ub, vb, mp, t0, k.shape[1])


def _fused_bwd(scale, n_head, res, g):
    qp, kp, pp, vp, ub, vb, mp, t0, s0 = res
    b, t, d = qp.shape
    s = kp.shape[1]
    dk = d // n_head
    g = _pad_to(g, 1, 16)

    xspec, kspec, pspec, bspec, mspec = _specs(t, s, d)
    shapes = [
        jax.ShapeDtypeStruct((b, t, d), qp.dtype),   # dq
        jax.ShapeDtypeStruct((b, s, d), kp.dtype),   # dk
        jax.ShapeDtypeStruct((b, s, d), vp.dtype),   # dv
        jax.ShapeDtypeStruct((1, s, d), jnp.float32),  # dp (accumulated)
        jax.ShapeDtypeStruct((8, d), jnp.float32),   # du (row 0)
        jax.ShapeDtypeStruct((8, d), jnp.float32),   # dvb (row 0)
    ]
    dq, dk_, dv, dp, du, dvb = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, n_head=n_head, dk=dk),
        grid=(b,),
        in_specs=[xspec, kspec, pspec, kspec, bspec, bspec, mspec, xspec],
        out_specs=[xspec, kspec, kspec, pspec, bspec, bspec],
        out_shape=shapes,
        interpret=_interpret(),
    )(qp, kp, pp, vp, ub, vb, mp, g)
    return (dq[:, :t0], dk_[:, :s0], dp[:, :s0].astype(pp.dtype),
            dv[:, :s0], du[0].astype(ub.dtype), dvb[0].astype(vb.dtype),
            None)


fused_relpos_attention.defvjp(_fused_fwd, _fused_bwd)
