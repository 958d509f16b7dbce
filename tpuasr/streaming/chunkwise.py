"""Chunkwise streaming drivers.

Window arithmetic parity with wenet `forward_chunk_by_chunk`
(wenet/transformer/encoder.py:301-361): each chunk consumes
``stride = subsampling_rate * chunk_size`` new raw feature frames but the
encoder sees an overlapping window of
``decoding_window = (chunk_size - 1) * subsampling_rate + right_context + 1``
frames (no subsampling cache — overlap recomputation instead).

`chunk_stream_encode` runs the whole utterance through the streaming path as
one `lax.scan` over pre-sliced windows — the jit-compiled equivalent of the
reference's python chunk loop (model/online_rnnt_model.py:274-344) and the
basis of the chunk-vs-full equivalence test.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def decoding_window(chunk_size: int, subsampling_rate: int, right_context: int) -> int:
    return (chunk_size - 1) * subsampling_rate + right_context + 1


def num_chunks(n_frames: int, chunk_size: int, subsampling_rate: int, right_context: int) -> int:
    """How many full chunks a stream of n_frames raw frames yields."""
    context = right_context + 1
    stride = subsampling_rate * chunk_size
    if n_frames < context:
        return 0
    return int(np.ceil((n_frames - context + 1) / stride))


def chunk_windows(
    feats: jnp.ndarray,  # [B, T, F] (zero-padded beyond stream end)
    chunk_size: int,
    subsampling_rate: int,
    right_context: int,
    n_chunks: int,
) -> jnp.ndarray:
    """-> [n_chunks, B, window, F] overlapping chunk windows (zero-padded past
    the end so every window has static shape)."""
    window = decoding_window(chunk_size, subsampling_rate, right_context)
    stride = subsampling_rate * chunk_size
    b, t, f = feats.shape
    need = (n_chunks - 1) * stride + window
    if need > t:
        feats = jnp.pad(feats, ((0, 0), (0, need - t), (0, 0)))
    idx = (jnp.arange(n_chunks) * stride)[:, None] + jnp.arange(window)[None, :]
    return jnp.take(feats, idx, axis=1).transpose(1, 0, 2, 3)


def chunk_stream_encode(
    model,
    params,
    feats: jnp.ndarray,  # [B, T, F]
    chunk_size: int,
    num_left_chunks: int,
    n_chunks: int,
):
    """Stream an utterance chunk-by-chunk -> [B, n_chunks * chunk_size, D].

    Output frame count may exceed the full-context encoder's (the zero-padded
    tail produces frames); callers mask with the true encoder lengths.

    Tail semantics: if the stream length is not a multiple of the chunk size,
    the final chunk's window is zero-padded, and *valid* frames inside that
    chunk attend the padded garbage through in-chunk lookahead — the same
    approximation wenet's padded ONNX streaming accepts
    (efficient_conformer/encoder.py:455-460). Exact-tail evaluation feeds
    only whole chunks (the RTF/CER harnesses do).
    """
    sub = model.cfg.encoder if hasattr(model.cfg, "encoder") else model.cfg
    from tpuasr.nn.subsampling import SUBSAMPLE_CLASSES

    sub_cls = SUBSAMPLE_CLASSES[sub.input_layer]
    windows = chunk_windows(
        feats, chunk_size, sub_cls.subsampling_rate, sub_cls.right_context, n_chunks
    )

    state0 = model.apply(
        params, feats.shape[0], chunk_size, num_left_chunks,
        method="init_encoder_state",
    )

    def step(state, xs):
        ys, new_state = model.apply(params, xs, state, method="encode_chunk")
        return new_state, ys

    state, outs = jax.lax.scan(step, state0, windows)  # [n_chunks, B, chunk, D]
    b = feats.shape[0]
    d = outs.shape[-1]
    ys = outs.transpose(1, 0, 2, 3).reshape(b, -1, d)
    return ys, state
