"""Fused conformer feed-forward for TPU: LN -> W1 -> swish -> dropout ->
W2 -> dropout -> scaled residual, one VMEM pass fwd, recompute bwd.

The unfused module chain (conformer.py:
`x + ff_scale * dropout(ffn(norm_ff(x)))`, ffn = Dense/swish/Dropout/Dense,
wenet encoder_layer.py:130-265 semantics) round-trips the [B, T, 4D] hidden
and several [B, T, D] intermediates through HBM between XLA fusions; at the
flagship shape those activations are the dominant share of the step's
"elementwise glue" (docs/RESULTS.md round-4 roofline: 2.5 ms of [B,T,D]
traffic). This kernel keeps x-hat, the hidden, and both dropout masks in
VMEM: HBM traffic drops to read x + weights, write out.

Dropout masks are generated OUTSIDE the kernel (one `jax.random.bernoulli`
per site — the session's threefry/RBG stream, hardware-fast under
`rng_impl="rbg"`) and passed in as uint8 inputs that the custom_vjp saves
as residuals: the backward kernel reads the exact forward masks. An earlier
design drew bits in-kernel via `pltpu.prng_*` with fwd/bwd reseeding — the
hardware measurement showed the PRNG's bit-to-element mapping is NOT stable
across the two kernel programs (finite-difference probe 0.79 vs analytic
grad 0.047 on the chip), so masks must flow through memory. With
`deterministic=True` (eval) the output matches the module chain to bf16
tolerance (tests/test_fused_ffn.py).

Weight gradients accumulate across the sequential row-tile grid in VMEM
(same pattern as attention_pallas dp/du accumulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-6


def _interpret():
    return jax.default_backend() == "cpu"


def _swish(h):
    return h * jax.nn.sigmoid(h)


def _ln(x):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + _LN_EPS)


def _fwd_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                m1_ref, m2_ref, o_ref, *, rate, scale, use_drop,
                compute_dtype):
    x = x_ref[...].astype(jnp.float32)
    xn = (_ln(x) * g_ref[0].astype(jnp.float32)
          + b_ref[0].astype(jnp.float32)).astype(compute_dtype)
    h = jnp.dot(xn, w1_ref[...],
                preferred_element_type=jnp.float32) + b1_ref[0].astype(jnp.float32)
    a = _swish(h)
    if use_drop:
        a = jnp.where(m1_ref[...] != 0, a / (1.0 - rate), 0.0)
    y = jnp.dot(a.astype(compute_dtype), w2_ref[...],
                preferred_element_type=jnp.float32) + b2_ref[0].astype(jnp.float32)
    if use_drop:
        y = jnp.where(m2_ref[...] != 0, y / (1.0 - rate), 0.0)
    o_ref[...] = (x + scale * y).astype(o_ref.dtype)


def _bwd_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                m1_ref, m2_ref, do_ref, dx_ref, dg_ref, db_ref, dw1_ref,
                db1_ref, dw2_ref, db2_ref, *, rate, scale, use_drop,
                compute_dtype):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    x = x_ref[...].astype(jnp.float32)
    g32 = g_ref[0].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _LN_EPS)
    xhat = (x - mu) * rstd
    xn = (xhat * g32 + b_ref[0].astype(jnp.float32)).astype(compute_dtype)
    h = jnp.dot(xn, w1_ref[...],
                preferred_element_type=jnp.float32) + b1_ref[0].astype(jnp.float32)
    sig = jax.nn.sigmoid(h)
    a = h * sig
    if use_drop:
        m1 = m1_ref[...] != 0
        ad = jnp.where(m1, a / (1.0 - rate), 0.0)
    else:
        ad = a
    do = do_ref[...].astype(jnp.float32)
    dy = do * scale
    if use_drop:
        dy = jnp.where(m2_ref[...] != 0, dy / (1.0 - rate), 0.0)
    dyc = dy.astype(compute_dtype)
    adc = ad.astype(compute_dtype)
    dw2_ref[...] += jnp.dot(adc.T, dyc, preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    dad = jnp.dot(dyc, w2_ref[...].T, preferred_element_type=jnp.float32)
    da = jnp.where(m1, dad / (1.0 - rate), 0.0) if use_drop else dad
    dh = da * (sig * (1.0 + h * (1.0 - sig)))  # d swish
    dhc = dh.astype(compute_dtype)
    dw1_ref[...] += jnp.dot(xn.T, dhc, preferred_element_type=jnp.float32)
    db1_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    dxn = jnp.dot(dhc, w1_ref[...].T, preferred_element_type=jnp.float32)
    dg_ref[...] += jnp.sum(dxn * xhat, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(dxn, axis=0, keepdims=True)
    dxhat = dxn * g32
    dln = rstd * (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True)
                  - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    dx_ref[...] = (do + dln).astype(dx_ref.dtype)


_ROWS = 256  # rows per grid step ([256, 4D] hidden = 1 MB fp32 in VMEM)


def _row_pad(x, mult=_ROWS):
    r = (-x.shape[0]) % mult
    return jnp.pad(x, ((0, r), (0, 0))) if r else x


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def fused_ffn(x, ln_scale, ln_bias, w1, b1, w2, b2, mask1, mask2,
              rate, ff_scale, deterministic):
    """x: [R, D] rows (caller flattens [B, T, D]); returns
    x + ff_scale * drop(W2 @ drop(swish(W1 @ LN(x)))).

    mask1 [R, hidden] / mask2 [R, D]: uint8 keep-masks (1 = keep) drawn by
    the caller (jax.random.bernoulli(1-rate)); pass None for both to run
    without dropout (eval, or rate 0). The custom_vjp saves them as
    residuals so the backward applies the exact forward masks."""
    out, _ = _fused_ffn_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2,
                            mask1, mask2, rate, ff_scale, deterministic)
    return out


def _specs(d, hidden):
    row = pl.BlockSpec((_ROWS, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    hid = pl.BlockSpec((_ROWS, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat = lambda a, b2_: pl.BlockSpec((a, b2_), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    return row, hid, vec, mat


def _mask_ops(x, mask1, mask2, hidden):
    """-> (use_drop, padded masks or tiny dummies, their specs)."""
    d = x.shape[1]
    row, hid, vec, _ = _specs(d, hidden)
    if mask1 is None:
        dummy = jnp.zeros((1, 128), jnp.uint8)
        spec = pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
        return False, dummy, dummy, spec, spec
    return True, _row_pad(mask1), _row_pad(mask2), hid, row


def _fused_ffn_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, mask1, mask2,
                   rate, ff_scale, deterministic):
    r0, d = x.shape
    hidden = w1.shape[1]
    xp = _row_pad(x)
    row, hid, vec, mat = _specs(d, hidden)
    use_drop, m1p, m2p, m1s, m2s = _mask_ops(x, mask1, mask2, hidden)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate, scale=ff_scale,
                          use_drop=use_drop, compute_dtype=x.dtype),
        grid=(xp.shape[0] // _ROWS,),
        in_specs=[row, vec(d), vec(d), mat(d, hidden), vec(hidden),
                  mat(hidden, d), vec(d), m1s, m2s],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        interpret=_interpret(),
    )(xp, ln_scale.reshape(1, -1), ln_bias.reshape(1, -1),
      w1, b1.reshape(1, -1), w2, b2.reshape(1, -1), m1p, m2p)
    return out[:r0], (x, ln_scale, ln_bias, w1, b1, w2, b2, mask1, mask2)


def _fused_ffn_bwd(rate, ff_scale, deterministic, res, gout):
    x, ln_scale, ln_bias, w1, b1, w2, b2, mask1, mask2 = res
    r0, d = x.shape
    hidden = w1.shape[1]
    xp = _row_pad(x)
    gp = _row_pad(gout)
    row, hid, vec, mat = _specs(d, hidden)
    use_drop, m1p, m2p, m1s, m2s = _mask_ops(x, mask1, mask2, hidden)
    shapes = [
        jax.ShapeDtypeStruct(xp.shape, x.dtype),        # dx
        jax.ShapeDtypeStruct((1, d), jnp.float32),      # d ln_scale
        jax.ShapeDtypeStruct((1, d), jnp.float32),      # d ln_bias
        jax.ShapeDtypeStruct((d, hidden), jnp.float32),  # dw1
        jax.ShapeDtypeStruct((1, hidden), jnp.float32),  # db1
        jax.ShapeDtypeStruct((hidden, d), jnp.float32),  # dw2
        jax.ShapeDtypeStruct((1, d), jnp.float32),      # db2
    ]
    dx, dg, db, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate, scale=ff_scale,
                          use_drop=use_drop, compute_dtype=x.dtype),
        grid=(xp.shape[0] // _ROWS,),
        in_specs=[row, vec(d), vec(d), mat(d, hidden), vec(hidden),
                  mat(hidden, d), vec(d), m1s, m2s, row],
        out_specs=[row, vec(d), vec(d), mat(d, hidden), vec(hidden),
                   mat(hidden, d), vec(d)],
        out_shape=shapes,
        interpret=_interpret(),
    )(xp, ln_scale.reshape(1, -1), ln_bias.reshape(1, -1),
      w1, b1.reshape(1, -1), w2, b2.reshape(1, -1), m1p, m2p, gp)
    return (dx[:r0], dg[0].astype(ln_scale.dtype), db[0].astype(ln_bias.dtype),
            dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(b2.dtype), None, None)


fused_ffn.defvjp(_fused_ffn_fwd, _fused_ffn_bwd)
