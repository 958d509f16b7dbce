"""Streaming RNN-T greedy decode: chunked encoder + carried decoder state.

Parity: model/online_rnnt_model.py:274-387 (`streaming_inference` /
`process_single_chunk` — streaming state = encoder att/cnn caches + predictor
LSTM state + last emitted token), re-designed as one pytree
(`StreamingState`) threaded through a pure, batched, jit-compiled
`process_chunk`, so B streams decode concurrently and a whole utterance runs
as a single `lax.scan` over chunk windows. The reference is Python
launch-overhead-bound here (SURVEY §3.4) — this is the path RTF is measured
on (tpuasr.eval.rtf).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from tpuasr.decode.rnnt_beam import BeamCarry, beam_frames, init_beam_carry
from tpuasr.decode.rnnt_greedy import GreedyCarry, greedy_frames, init_greedy_carry
from tpuasr.nn.conformer import EncoderStreamState
from tpuasr.streaming.chunkwise import chunk_windows, num_chunks


@dataclass
class StreamingState:
    enc: EncoderStreamState
    dec: GreedyCarry
    enc_lens: jnp.ndarray  # [B] total valid encoder frames per stream (decode gate)


jax.tree_util.register_dataclass(
    StreamingState, data_fields=["enc", "dec", "enc_lens"], meta_fields=[]
)


def init_streaming_state(
    model,
    params,
    batch: int,
    chunk_size: int,
    num_left_chunks: int,
    blank_id: int,
    max_tokens: int = 200,
    enc_lens=None,
) -> StreamingState:
    """Fresh streaming state (reset_streaming_cache parity,
    model/online_rnnt_model.py:145-164)."""
    enc = model.apply(params, batch, chunk_size, num_left_chunks,
                      method="init_encoder_state")
    dec = init_greedy_carry(model, params, batch, blank_id, max_tokens)
    if enc_lens is None:
        enc_lens = jnp.full((batch,), jnp.iinfo(jnp.int32).max, jnp.int32)
    return StreamingState(enc=enc, dec=dec, enc_lens=jnp.asarray(enc_lens, jnp.int32))


def process_chunk(
    model,
    params,
    chunk_feats: jnp.ndarray,  # [B, window, F] raw features for this chunk
    state: StreamingState,
    blank_id: int,
    n_steps: int = 10,
) -> StreamingState:
    """Encode one chunk and greedily decode its frames (incremental API)."""
    from tpuasr.models.transducer import stream_output_factor

    ys, enc_state = model.apply(params, chunk_feats, state.enc, method="encode_chunk")
    chunk = ys.shape[1]
    out_factor = stream_output_factor(model.cfg.encoder)
    frame_idx = state.enc.offset // out_factor + jnp.arange(chunk)[None, :]
    valid = frame_idx < state.enc_lens[:, None]
    dec = greedy_frames(model, params, ys, valid, state.dec, blank_id, n_steps)
    return StreamingState(enc=enc_state, dec=dec, enc_lens=state.enc_lens)


def streaming_greedy_decode(
    model,
    params,
    feats: jnp.ndarray,  # [B, T, F]
    feat_lens: jnp.ndarray,  # [B]
    chunk_size: int,
    num_left_chunks: int,
    blank_id: int,
    n_steps: int = 10,
    max_tokens: int = 200,
):
    """Whole-utterance simulated streaming -> (tokens, token_lens, state)."""
    from tpuasr.models.transducer import stream_output_len
    from tpuasr.nn.subsampling import SUBSAMPLE_CLASSES

    cfg = model.cfg.encoder
    sub = SUBSAMPLE_CLASSES[cfg.input_layer]
    b, t, _ = feats.shape
    n = num_chunks(t, chunk_size, sub.subsampling_rate, sub.right_context)
    enc_lens = stream_output_len(cfg, feat_lens)

    windows = chunk_windows(feats, chunk_size, sub.subsampling_rate, sub.right_context, n)
    state = init_streaming_state(
        model, params, b, chunk_size, num_left_chunks, blank_id, max_tokens, enc_lens
    )

    def step(state, xs):
        return process_chunk(model, params, xs, state, blank_id, n_steps), None

    state, _ = jax.lax.scan(step, state, windows)
    return state.dec.hyp[:, :max_tokens], state.dec.hyp_len, state


# ---------------------------------------------------------------------------
# streaming beam search (model/online_rnnt_model.py:534-645 parity, batched)
# ---------------------------------------------------------------------------


@dataclass
class StreamingBeamState:
    enc: EncoderStreamState
    beam: BeamCarry
    enc_lens: jnp.ndarray  # [B]


jax.tree_util.register_dataclass(
    StreamingBeamState, data_fields=["enc", "beam", "enc_lens"], meta_fields=[]
)


def init_streaming_beam_state(
    model, params, batch, chunk_size, num_left_chunks, beam_size, max_tokens=200,
    enc_lens=None,
) -> StreamingBeamState:
    enc = model.apply(params, batch, chunk_size, num_left_chunks,
                      method="init_encoder_state")
    beam = init_beam_carry(model, params, batch, beam_size, max_tokens)
    if enc_lens is None:
        enc_lens = jnp.full((batch,), jnp.iinfo(jnp.int32).max, jnp.int32)
    return StreamingBeamState(enc=enc, beam=beam, enc_lens=jnp.asarray(enc_lens, jnp.int32))


def process_chunk_beam(
    model, params, chunk_feats, state: StreamingBeamState, blank_id: int,
    n_steps: int = 1, ctc_weight: float = 0.0, transducer_weight: float = 0.7,
) -> StreamingBeamState:
    """Encode one chunk and advance the beam over its frames
    (process_single_chunk_beam_search parity, batched). `ctc_weight > 0`
    fuses the chunk's CTC log-probs per frame — the reference has this only
    offline (prefix_beam_search.py:99-101); streaming CTC heads make it free
    here."""
    from tpuasr.models.transducer import stream_output_factor

    ys, enc_state = model.apply(params, chunk_feats, state.enc, method="encode_chunk")
    chunk = ys.shape[1]
    out_factor = stream_output_factor(model.cfg.encoder)
    frame_idx = state.enc.offset // out_factor + jnp.arange(chunk)[None, :]
    valid = frame_idx < state.enc_lens[:, None]
    ctc_logp = None
    if ctc_weight > 0:
        ctc_logits = model.apply(params, ys, method="ctc_logits")
        ctc_logp = jax.nn.log_softmax(ctc_logits.astype(jnp.float32), axis=-1)
    beam = beam_frames(model, params, ys, valid, state.beam, blank_id,
                       n_steps=n_steps, ctc_logp=ctc_logp,
                       transducer_weight=transducer_weight, ctc_weight=ctc_weight)
    return StreamingBeamState(enc=enc_state, beam=beam, enc_lens=state.enc_lens)


def streaming_beam_decode(
    model,
    params,
    feats: jnp.ndarray,
    feat_lens: jnp.ndarray,
    chunk_size: int,
    num_left_chunks: int,
    blank_id: int,
    beam_size: int = 4,
    max_tokens: int = 200,
    n_steps: int = 1,
    ctc_weight: float = 0.0,
    transducer_weight: float = 0.7,
):
    """Whole-utterance simulated streaming beam search ->
    (best tokens, best lens, final state)."""
    from tpuasr.models.transducer import stream_output_len
    from tpuasr.nn.subsampling import SUBSAMPLE_CLASSES

    cfg = model.cfg.encoder
    sub = SUBSAMPLE_CLASSES[cfg.input_layer]
    b, t, _ = feats.shape
    n = num_chunks(t, chunk_size, sub.subsampling_rate, sub.right_context)
    enc_lens = stream_output_len(cfg, feat_lens)

    windows = chunk_windows(feats, chunk_size, sub.subsampling_rate, sub.right_context, n)
    state = init_streaming_beam_state(
        model, params, b, chunk_size, num_left_chunks, beam_size, max_tokens, enc_lens
    )

    def step(state, xs):
        return process_chunk_beam(
            model, params, xs, state, blank_id, n_steps,
            ctc_weight=ctc_weight, transducer_weight=transducer_weight,
        ), None

    state, _ = jax.lax.scan(step, state, windows)
    best = jnp.argmax(state.beam.logp, axis=1)
    tokens = jnp.take_along_axis(state.beam.tokens, best[:, None, None], axis=1)[:, 0]
    lens = jnp.take_along_axis(state.beam.lens, best[:, None], axis=1)[:, 0]
    return tokens, lens, state
