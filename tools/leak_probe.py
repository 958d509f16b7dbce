#!/usr/bin/env python
"""Host-RSS leak probe for the train loop.

The 50-epoch campaign's host RSS grew ~one batch of memory per step
(~9 MB/step, OOM-killed at 129 GB after ~15k steps). This probe runs the
real `run_epoch` loop on a small flagship-shaped model and samples RSS every
N steps, optionally with (a) per-step fresh numpy batches vs one reused
device batch — separates a host->device transfer-path leak from an
execute-path leak — and (b) the CPU backend vs the tunneled TPU — separates
a framework-level reference leak from the tunnel client.

    python tools/leak_probe.py --steps 300 [--cpu] [--reuse-batch] [--no-donate]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024
    return 0.0


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--every", type=int, default=50)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reuse-batch", action="store_true",
                    help="device_put one batch once and reuse it every step")
    ap.add_argument("--no-donate", action="store_true")
    ap.add_argument("--donate-batch", action="store_true",
                    help="donate the batch buffers too (fresh per step)")
    ap.add_argument("--gc", action="store_true",
                    help="gc.collect() at every sample point — discriminates "
                         "cyclic-GC-held buffer handles from a hard leak")
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--frames", type=int, default=256)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tpuasr.config import Config
    from tpuasr.data.pipeline import BatchSpec, device_view, make_batch
    from tpuasr.data.synthetic import synth_corpus
    from tpuasr.models import Transducer
    from tpuasr.train import TrainState, make_optimizer, make_train_step
    from tpuasr.utils.rng import root_key

    cfg = Config()
    cfg.model.encoder.causal = True
    cfg.model.encoder.use_dynamic_chunk = True
    cfg.model.encoder.static_chunk_size = 32
    if jax.default_backend() == "tpu":
        cfg.model.compute_dtype = "bfloat16"
        cfg.model.fused_joint_loss = True
        cfg.model.encoder.fused_attention = True
        cfg.model.encoder.scan_layers = True

    model = Transducer(cfg.model)
    utts = synth_corpus(args.batch, cfg.model.vocab_size, seed=0,
                        min_tokens=8, max_tokens=10,
                        sample_rate=cfg.feature.sample_rate,
                        samples_per_token=(args.frames - 6) * cfg.feature.hop_length // 10)
    np_batch = make_batch(utts, BatchSpec(
        args.batch, (args.frames - 1) * cfg.feature.hop_length, 12))

    feats_t = 1 + np_batch["waves"].shape[1] // cfg.feature.hop_length
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((args.batch, feats_t, 80), np.float32),
        np.full((args.batch,), feats_t, np.int32),
        np_batch["texts"], np_batch["text_lens"])
    tx = make_optimizer(cfg.optim)
    state = TrainState.create(params, tx)
    step_fn = make_train_step(model, tx, cfg, donate=not args.no_donate,
                              donate_batch=args.donate_batch)
    rng = root_key(1, cfg.train.rng_impl)

    reused = device_view(dict(np_batch)) if args.reuse_batch else None

    # warmup/compile
    db = reused if reused is not None else device_view(dict(np_batch))
    state, metrics = step_fn(state, db, rng)
    jax.block_until_ready(metrics["loss"])
    base = rss_mb()
    print(f"backend={jax.default_backend()} donate={not args.no_donate} "
          f"reuse_batch={args.reuse_batch} post-compile RSS {base:.0f} MB")

    samples = []
    for i in range(1, args.steps + 1):
        if reused is not None:
            db = reused
        else:
            # fresh host arrays every step, like the real data pipeline
            fresh = {k: (v.copy() if isinstance(v, np.ndarray) else v)
                     for k, v in np_batch.items()}
            db = device_view(fresh)
        state, metrics = step_fn(state, db, rng)
        if i % args.every == 0:
            jax.block_until_ready(metrics["loss"])
            if args.gc:
                import gc

                gc.collect()
            cur = rss_mb()
            samples.append(cur)
            print(f"step {i:5d}  RSS {cur:8.0f} MB  (+{cur - base:7.1f})")

    if len(samples) >= 2:
        per_step = (samples[-1] - samples[0]) / (args.steps - args.every)
        print(f"leak ~{per_step * 1024:.0f} KB/step over steady state")


if __name__ == "__main__":
    main()
