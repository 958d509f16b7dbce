"""Real-time-factor / per-chunk latency benchmark.

Parity: online_rnnt_delay.py:14-204 — wall-clock around each chunk's
`process_chunk` call divided by the chunk's audio duration, with
mean/p50/p80/p90/p95/max percentiles, for both greedy and beam streaming
paths. Chunk audio duration = chunk_size * subsampling_rate * hop / sr
(rnnt_common.py:16-18: 32 enc frames x 4 x 512 / 48k ≈ 1.37 s; the reference
quotes 10 ms frames → 1.28 s).

Measured on the jit-compiled incremental APIs with `block_until_ready` so the
timings are device wall-clock, not dispatch time; the first (compile) chunk is
excluded via warmup.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpuasr.config import Config
from tpuasr.decode.rnnt_streaming import (
    init_streaming_beam_state,
    init_streaming_state,
    process_chunk,
    process_chunk_beam,
)
from tpuasr.nn.subsampling import SUBSAMPLE_CLASSES
from tpuasr.streaming.chunkwise import chunk_windows, num_chunks


@dataclass
class RtfStats:
    rtf_mean: float
    rtf_p50: float
    rtf_p80: float
    rtf_p90: float
    rtf_p95: float
    rtf_max: float
    chunk_audio_seconds: float
    n_chunks: int
    # in-protocol tenancy control (VERDICT r4 weak#8): wall-clock of a
    # trivial jitted dispatch (tiny reduce, ~zero device work) measured in
    # the SAME window, interleaved with the chunk timings. It isolates the
    # shared-chip dispatch+queue latency from the decode work, so RTF drift
    # between sessions is attributable: if probe_p50 moved with rtf_p50, it
    # was tenancy; if RTF moved alone, it was a regression.
    probe_p50_ms: float = 0.0
    probe_mean_ms: float = 0.0

    @staticmethod
    def from_times(times, chunk_audio_seconds, probe_times=None):
        r = np.asarray(times) / chunk_audio_seconds
        p = np.asarray(probe_times) * 1e3 if probe_times else np.zeros(1)
        return RtfStats(
            float(r.mean()), float(np.percentile(r, 50)), float(np.percentile(r, 80)),
            float(np.percentile(r, 90)), float(np.percentile(r, 95)), float(r.max()),
            chunk_audio_seconds, len(times),
            float(np.percentile(p, 50)), float(p.mean()),
        )


def measure_rtf(
    model,
    params,
    feats: jnp.ndarray,  # [B, T, F] features of the test stream(s)
    cfg: Config,
    mode: str = "greedy",  # greedy | beam
    beam_size: int = 4,
    n_steps: int = 10,
    warmup_chunks: int = 2,
) -> RtfStats:
    c = cfg.model
    chunk = cfg.streaming.chunk_size
    left = cfg.streaming.num_left_chunks
    sub = SUBSAMPLE_CLASSES[c.encoder.input_layer]
    b, t, _ = feats.shape
    n = num_chunks(t, chunk, sub.subsampling_rate, sub.right_context)
    windows = chunk_windows(feats, chunk, sub.subsampling_rate, sub.right_context, n)
    chunk_audio_seconds = (
        chunk * sub.subsampling_rate * cfg.feature.hop_length / cfg.feature.sample_rate
    )

    if mode == "greedy":
        state = init_streaming_state(model, params, b, chunk, left, c.blank_id)
        step = jax.jit(
            lambda xs, st: process_chunk(model, params, xs, st, c.blank_id, n_steps)
        )
    elif mode == "beam":
        # same per-frame emission budget as greedy — round-1 measured beam-4
        # *faster* than greedy because beam defaulted to one expansion per
        # frame while greedy ran the <=n_steps while_loop (the RTF-inversion
        # root cause); matched n_steps makes the modes comparable
        state = init_streaming_beam_state(model, params, b, chunk, left, beam_size)
        step = jax.jit(
            lambda xs, st: process_chunk_beam(model, params, xs, st, c.blank_id,
                                              n_steps)
        )
    else:
        raise ValueError(mode)

    # idle-dispatch tenancy probe: a near-no-op program timed in the same
    # window as every chunk (reference protocol anchor:
    # online_rnnt_delay.py:95-133 has no such control — its numbers are
    # unnormalizable across sessions on shared hardware)
    probe = jax.jit(lambda x: jnp.sum(x * x))
    probe_x = jnp.ones((128,), jnp.float32)

    # warmup (compile) on the first windows without counting them
    warm_state = state
    for i in range(min(warmup_chunks, n)):
        warm_state = step(windows[i], warm_state)
    jax.block_until_ready(warm_state)
    jax.block_until_ready(probe(probe_x))

    times, probe_times = [], []
    for i in range(n):
        t0 = time.perf_counter()
        state = step(windows[i], state)
        jax.block_until_ready(state)
        times.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(probe(probe_x))
        probe_times.append(time.perf_counter() - t0)
    return RtfStats.from_times(times, chunk_audio_seconds, probe_times)


def measure_first_token_delay(
    model,
    params,
    feats: jnp.ndarray,  # [B, T, F]
    feat_lens: jnp.ndarray,
    cfg: Config,
    n_steps: int = 10,
) -> dict:
    """First-token delay: audio seconds consumed before each stream's first
    non-blank emission, plus processing time up to that chunk (BASELINE.md
    primary metric "p50 first-token delay"; reference proxy:
    online_rnnt_delay.py chunk budget)."""
    c = cfg.model
    chunk = cfg.streaming.chunk_size
    left = cfg.streaming.num_left_chunks
    sub = SUBSAMPLE_CLASSES[c.encoder.input_layer]
    b, t, _ = feats.shape
    n = num_chunks(t, chunk, sub.subsampling_rate, sub.right_context)
    windows = chunk_windows(feats, chunk, sub.subsampling_rate, sub.right_context, n)
    chunk_audio = (
        chunk * sub.subsampling_rate * cfg.feature.hop_length / cfg.feature.sample_rate
    )

    from tpuasr.nn.subsampling import subsampled_len

    enc_lens = subsampled_len(c.encoder.input_layer, feat_lens)
    state = init_streaming_state(model, params, b, chunk, left, c.blank_id,
                                 enc_lens=enc_lens)
    step = jax.jit(
        lambda xs, st: process_chunk(model, params, xs, st, c.blank_id, n_steps)
    )
    # warmup/compile outside the timed region
    jax.block_until_ready(step(windows[0], state))

    first_chunk = np.full(b, -1, np.int64)
    proc_time = np.zeros(b, np.float64)
    elapsed = 0.0
    for i in range(n):
        t0 = time.perf_counter()
        state = step(windows[i], state)
        jax.block_until_ready(state)
        elapsed += time.perf_counter() - t0
        lens = np.asarray(state.dec.hyp_len)
        newly = (lens > 0) & (first_chunk < 0)
        first_chunk[newly] = i
        proc_time[newly] = elapsed
        if np.all(first_chunk >= 0):
            break
    emitted = first_chunk >= 0
    audio_delay = (first_chunk + 1) * chunk_audio
    total_delay = audio_delay + proc_time
    valid = total_delay[emitted]
    return {
        "emitted_fraction": float(emitted.mean()),
        "p50_first_token_delay_s": float(np.percentile(valid, 50)) if valid.size else float("nan"),
        "p90_first_token_delay_s": float(np.percentile(valid, 90)) if valid.size else float("nan"),
        "chunk_audio_seconds": chunk_audio,
    }
