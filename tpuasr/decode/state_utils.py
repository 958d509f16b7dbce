"""Predictor-state pytree utilities for batched decoding.

Different predictor families carry different state layouts (LSTM: ([L,B,H],
[L,B,H]) with batch at axis 1; embedding/conv: ([B,hist,E],) with batch at
axis 0). These helpers make greedy/beam decoding generic over the layout —
the TPU-native replacement of wenet's per-predictor batch_to_cache /
cache_to_batch reshaping (wenet/transducer/predictor.py:17-57)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def predictor_state_axis(model) -> int:
    from tpuasr.nn.predictor import PREDICTOR_CLASSES

    return PREDICTOR_CLASSES[model.cfg.predictor.predictor_type].state_batch_axis


def where_state(mask_b: jnp.ndarray, new_state, old_state, axis: int):
    """Per-stream select: mask_b [B] True -> take new leaf values."""

    def sel(n, o):
        shape = [1] * n.ndim
        shape[axis] = mask_b.shape[0]
        return jnp.where(mask_b.reshape(shape), n, o)

    return jax.tree.map(sel, new_state, old_state)


def split_beam_axis(state, b: int, n: int, axis: int):
    """Leaves with flattened B*N at `axis` -> (..., B, N, ...)."""

    def r(x):
        return x.reshape(x.shape[:axis] + (b, n) + x.shape[axis + 1 :])

    return jax.tree.map(r, state)


def merge_beam_axis(state, axis: int):
    """Leaves with (..., B, N, ...) at `axis` -> flattened B*N."""

    def r(x):
        return x.reshape(x.shape[:axis] + (-1,) + x.shape[axis + 2 :])

    return jax.tree.map(r, state)


def gather_beam(state, sel: jnp.ndarray, axis: int):
    """Gather hypotheses: leaves (..., B, N, ...), sel [B, N] -> reindexed."""

    def g(x):
        idx = sel.reshape((1,) * axis + sel.shape + (1,) * (x.ndim - axis - 2))
        return jnp.take_along_axis(x, idx, axis=axis + 1)

    return jax.tree.map(g, state)


def where_beam(mask: jnp.ndarray, new_state, old_state, axis: int):
    """Select per (B, N) slot: mask [B, N] True -> new."""

    def sel(n, o):
        m = mask.reshape((1,) * axis + mask.shape + (1,) * (n.ndim - axis - 2))
        return jnp.where(m, n, o)

    return jax.tree.map(sel, new_state, old_state)
