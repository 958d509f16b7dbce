"""Benchmark: flagship streaming-RNN-T training throughput on one chip.

Prints ONE JSON line:
  {"metric": "train_audio_seconds_per_second_per_chip", "value": N,
   "unit": "audio-s/s/chip", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md); the recorded comparison
protocol is audio-seconds/s/chip on the reference's training configuration
(12-block d256 causal conformer + LSTM predictor + joint, dynamic-chunk
training, batch 12 — rnnt_common.py:7-21). `vs_baseline` is the real-time
factor (value / 1.0 audio-second per second): how many seconds of audio are
trained per wall-clock second per chip.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    from tpuasr.config import Config
    from tpuasr.data.pipeline import BatchSpec, device_view, make_batch
    from tpuasr.data.synthetic import synth_corpus
    from tpuasr.models import Transducer
    from tpuasr.train import TrainState, make_optimizer, make_train_step

    cfg = Config()
    cfg.feature.sample_rate = 16000
    cfg.model.compute_dtype = "bfloat16"
    cfg.model.encoder.causal = True
    cfg.model.encoder.use_dynamic_chunk = True
    cfg.model.encoder.static_chunk_size = 32

    batch_size = 12  # reference protocol (rnnt_common.py:9)
    frames = 256  # ~8.2 s per utterance at 16 kHz / hop 512
    tokens = 32

    model = Transducer(cfg.model)
    utts = synth_corpus(
        batch_size, cfg.model.vocab_size, seed=0, min_tokens=24, max_tokens=30,
        sample_rate=cfg.feature.sample_rate,
        samples_per_token=(frames - 6) * cfg.feature.hop_length // 30,
    )
    batch = device_view(make_batch(utts, BatchSpec(batch_size, (frames - 1) * 512, tokens)))

    feats_t = 1 + batch["waves"].shape[1] // cfg.feature.hop_length
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((batch_size, feats_t, 80), np.float32),
        np.full((batch_size,), feats_t, np.int32),
        batch["texts"],
        batch["text_lens"],
    )
    tx = make_optimizer(cfg.optim)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, cfg, donate=True)
    rng = jax.random.PRNGKey(1)

    audio_seconds = float(np.sum(batch["wave_lens"])) / cfg.feature.sample_rate

    # warmup / compile
    for _ in range(2):
        state, metrics = step(state, batch, rng)
    jax.block_until_ready(metrics["loss"])

    # best-of-3 windows: the device may be time-shared; peak throughput is
    # the capability number
    n_steps = 10
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = step(state, batch, rng)
        jax.block_until_ready(metrics["loss"])
        best_dt = min(best_dt, time.perf_counter() - t0)

    value = audio_seconds * n_steps / best_dt
    print(json.dumps({
        "metric": "train_audio_seconds_per_second_per_chip",
        "value": round(value, 2),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(value, 2),
    }))


if __name__ == "__main__":
    # keep stderr noise (platform warnings) away from the JSON line
    sys.stderr = open(os.devnull, "w") if os.environ.get("BENCH_QUIET") else sys.stderr
    main()
