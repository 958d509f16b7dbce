#!/usr/bin/env python
"""Batch-scaling sweep of the flagship train step at a fixed utterance shape.

VERDICT r4 weak#4/next#4: the only batch-48 number on record was an r02-path
53.1 ms (below batch-12 throughput) and was never re-measured on the fused
path. This tool times the EXACT train step the loop builds (make_train_step,
flagship TPU config) at several batch sizes in ONE process, with the batch
pre-placed on device (transfer excluded — the loop overlaps it via
tpuasr.data.prefetch), and prints ms/step + audio-s/s for each.

    python tools/batch_sweep.py --frames 256 --tokens 14 --batches 12 24 48
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=256,
                    help="padded feature frames per utterance (campaign "
                         "bucket: 256; bench shape: 768)")
    ap.add_argument("--tokens", type=int, default=14)
    ap.add_argument("--batches", type=int, nargs="*", default=[12, 24, 48])
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--sample_rate", type=int, default=48000)
    ap.add_argument("--set", nargs="*", default=[], help="dotted overrides")
    args = ap.parse_args()

    import jax

    from tools.train import parse_overrides
    from tpuasr.config import Config, override
    from tpuasr.models import Transducer
    from tpuasr.train import TrainState, make_optimizer
    from tpuasr.train.step import make_train_step
    from tpuasr.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = Config()
    # flagship TPU fast path (tools/train.py defaults)
    cfg.model.compute_dtype = "bfloat16"
    cfg.model.fused_joint_loss = True
    cfg.model.encoder.fused_attention = True
    cfg.feature.fbank_precision = "default"
    cfg.feature.sample_rate = args.sample_rate
    cfg.model.encoder.causal = True
    cfg.model.encoder.use_dynamic_chunk = True
    cfg.model.encoder.static_chunk_size = 32
    cfg = override(cfg, parse_overrides(args.set))

    model = Transducer(cfg.model)
    tx = make_optimizer(cfg.optim)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    wave_samples = (args.frames - 1) * cfg.feature.hop_length
    audio_s_per_utt = wave_samples / cfg.feature.sample_rate

    results = []
    for b in args.batches:
        waves = (rng.standard_normal((b, wave_samples)) * 0.1).astype(np.float32)
        wave_lens = np.full(b, wave_samples, np.int32)
        texts = rng.integers(6, cfg.model.vocab_size, (b, args.tokens)).astype(np.int32)
        text_lens = np.full(b, args.tokens, np.int32)
        feats_t = 1 + wave_samples // cfg.feature.hop_length
        params = model.init(key, np.zeros((b, feats_t, 80), np.float32),
                            np.full(b, feats_t, np.int32), texts, text_lens)
        state = TrainState.create(params, tx)
        # donate=False so state/batch are reusable across timed iterations
        step = make_train_step(model, tx, cfg, donate=False)
        batch = jax.device_put({"waves": waves, "wave_lens": wave_lens,
                                "texts": texts, "text_lens": text_lens})
        t0 = time.perf_counter()
        state, metrics = step(state, batch, key)
        jax.block_until_ready(metrics["loss"])
        compile_s = time.perf_counter() - t0

        # timed: dispatch all steps, block at the end (loop protocol)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = step(state, batch, key)
        jax.block_until_ready(metrics["loss"])
        ms = (time.perf_counter() - t0) / args.steps * 1e3
        tput = b * audio_s_per_utt / (ms / 1e3)
        results.append((b, ms, tput, compile_s))
        print(f"B={b:3d}: {ms:8.2f} ms/step  {tput:9.1f} audio-s/s "
              f"(compile {compile_s:.1f}s, {b * args.frames} frames/step)",
              flush=True)

    base = results[0]
    for b, ms, tput, _ in results[1:]:
        print(f"B={b} vs B={base[0]}: {tput / base[2]:.2f}x throughput "
              f"({ms / base[1]:.2f}x step time for {b / base[0]:.0f}x batch)")


if __name__ == "__main__":
    main()
