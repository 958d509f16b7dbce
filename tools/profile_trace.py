#!/usr/bin/env python
"""Capture a jax.profiler device trace of N flagship train steps
(SURVEY §5.1 TPU plan: profiler trace + block_until_ready timing harness;
view with TensorBoard's profile plugin or xprof)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="exp/trace")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--fused", action="store_true")
    args = ap.parse_args()

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
    cfg.model.fused_joint_loss = args.fused

    model = Transducer(cfg.model)
    utts = synth_corpus(12, cfg.model.vocab_size, seed=0, min_tokens=24, max_tokens=30,
                        sample_rate=16000, samples_per_token=(250 - 6) * 512 // 30)
    batch = device_view(make_batch(utts, BatchSpec(12, 255 * 512, 32)))
    feats_t = 1 + batch["waves"].shape[1] // 512
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((12, feats_t, 80), np.float32),
                        np.full(12, feats_t, np.int32),
                        batch["texts"], batch["text_lens"])
    tx = make_optimizer(cfg.optim)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, cfg, donate=False)
    rng = jax.random.PRNGKey(1)

    state, m = step(state, batch, rng)
    jax.block_until_ready(m["loss"])
    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            state, m = step(state, batch, rng)
        jax.block_until_ready(m["loss"])
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
