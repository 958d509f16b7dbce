#!/usr/bin/env python
"""RTF / per-chunk latency benchmark CLI (online_rnnt_delay.py parity):
mean/p50/p80/p90/p95/max RTF for streaming greedy and beam decode."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", default=None,
                    help="optional; random params if omitted (timing only)")
    ap.add_argument("--config", default=None)
    ap.add_argument("--set", nargs="*", default=[])
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--beam_size", type=int, default=4)
    ap.add_argument("--modes", nargs="*", default=["greedy", "beam"])
    args = ap.parse_args()

    import jax

    from tpuasr.utils.compile_cache import enable_compilation_cache, enable_stack_dumps

    enable_stack_dumps()
    enable_compilation_cache()  # TPUASR_COMPILE_CACHE=off to disable

    from tools.train import build_model, parse_overrides
    from tpuasr.config import Config, load_yaml, override
    from tpuasr.eval import measure_rtf

    cfg = load_yaml(args.config) if args.config else Config()
    cfg = override(cfg, parse_overrides(args.set))
    model = build_model(cfg, "online_rnnt")

    rng = np.random.default_rng(0)
    t = int(args.seconds * cfg.feature.sample_rate / cfg.feature.hop_length)
    feats = rng.standard_normal((args.batch, t, 80)).astype(np.float32)

    params = model.init(
        jax.random.PRNGKey(0), np.zeros((args.batch, 64, 80), np.float32),
        np.full((args.batch,), 64, np.int32), np.zeros((args.batch, 4), np.int32),
        np.full((args.batch,), 4, np.int32),
    )
    if args.checkpoint:
        from tpuasr.train import TrainState, make_optimizer
        from tpuasr.train.checkpoint import restore_checkpoint

        tx = make_optimizer(cfg.optim)
        params = restore_checkpoint(args.checkpoint, TrainState.create(params, tx)).params

    for mode in args.modes:
        s = measure_rtf(model, params, feats, cfg, mode=mode,
                        beam_size=args.beam_size, n_steps=cfg.streaming.n_steps)
        print(f"[{mode}] chunks={s.n_chunks} chunk_audio={s.chunk_audio_seconds:.2f}s "
              f"RTF mean={s.rtf_mean:.4f} p50={s.rtf_p50:.4f} p80={s.rtf_p80:.4f} "
              f"p90={s.rtf_p90:.4f} p95={s.rtf_p95:.4f} max={s.rtf_max:.4f} "
              f"| tenancy probe p50={s.probe_p50_ms:.2f}ms mean={s.probe_mean_ms:.2f}ms")


if __name__ == "__main__":
    main()
