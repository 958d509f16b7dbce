"""Simulated streaming by prefix recomputation.

A fallback driver that produces *exact* streaming outputs for ANY encoder
family — including non-causal configurations with no cached-chunk support —
by re-running the chunk-masked full forward over the growing prefix each
chunk and emitting only the new frames. Semantics identical to a cached
implementation (the chunk attention mask guarantees frame t never sees future
chunks); cost is O(T^2) instead of O(T x cache).

The production streaming path is the cached one: conformer ring caches live
in streaming/chunkwise.py, and the squeezeformer / efficient-conformer
multi-rate caches in streaming/family_cache.py (round 2). This module remains
for evaluation of configs those caches don't cover and as the equivalence
oracle in tests.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np


def chunked_prefix_encode(
    encode_fn: Callable,  # (feats [B, Tp, F], lens [B]) -> (ys [B, T', D], ...)
    feats: jnp.ndarray,  # [B, T, F]
    feat_lens: jnp.ndarray,  # [B]
    chunk_size: int,
    subsampling_rate: int,
    right_context: int,
    out_len_fn: Callable[[int], int],
    lookahead: int = 0,
):
    """-> list of per-chunk new encoder frames [B, <=chunk+lookahead, D].

    `lookahead`: encoder frames withheld until their right context has
    arrived — for non-causal conv modules this is
    `num_blocks * (kernel_size // 2)` (a frame's value is only final once the
    prefix extends that far past it); 0 for fully causal encoders. The final
    chunk flushes everything.
    """
    b, t, _ = np.shape(feats)
    stride = chunk_size * subsampling_rate
    context = right_context + 1
    outs = []
    emitted = 0
    cur = stride
    while cur - stride < t - context + 1:
        prefix = min(cur + (context - 1), t)
        last = prefix >= t
        ys, *_ = encode_fn(feats[:, :prefix], jnp.minimum(feat_lens, prefix))
        avail = min(out_len_fn(prefix), ys.shape[1])
        finalized = avail if last else max(avail - lookahead, 0)
        n_new = finalized - emitted
        if n_new > 0:
            outs.append(ys[:, emitted : emitted + n_new])
            emitted += n_new
        cur += stride
    return outs
