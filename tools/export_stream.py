#!/usr/bin/env python
"""Export the streaming serving surface to portable StableHLO artifacts.

The CLI counterpart of `tpuasr/export.py::export_streaming` — the role of
the reference's TorchScript export entry points (wenet
transducer.py:443-472 `forward_encoder_chunk` / `forward_predictor_step` /
`forward_joint_step`; asr_model.py:340-527): load a checkpoint, serialize
encoder_chunk / predictor_step / joint_step / fused process_chunk for a
fixed number of parallel streams, write a manifest, and round-trip-verify
the artifacts by reloading and running one zero-input chunk.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", default=None,
                    help="trained checkpoint (omit for random init smoke)")
    ap.add_argument("--out", required=True, help="output artifact directory")
    ap.add_argument("--config", default=None)
    ap.add_argument("--set", nargs="*", default=[])
    ap.add_argument("--batch", type=int, default=1,
                    help="number of parallel streams baked into the export")
    ap.add_argument("--max_tokens", type=int, default=200)
    ap.add_argument("--verify", action="store_true",
                    help="reload the artifacts and run one zero-input chunk")
    args = ap.parse_args()

    import jax

    from tpuasr.utils.compile_cache import enable_compilation_cache, enable_stack_dumps

    enable_stack_dumps()
    enable_compilation_cache()  # TPUASR_COMPILE_CACHE=off to disable

    from tools.train import build_model, parse_overrides
    from tpuasr.config import Config, adapt_to_backend, load_yaml, override, resolve
    from tpuasr.export import export_streaming, load_exported
    from tpuasr.train import TrainState, make_optimizer
    from tpuasr.train.checkpoint import (
        find_effective_config, restore_checkpoint_migrating,
    )

    auto_cfg = args.config is None
    if auto_cfg and args.checkpoint:
        # resolved post-mutation config persisted by train_loop (train.yaml)
        args.config = find_effective_config(args.checkpoint)
        if args.config:
            print(f"effective config: {args.config}")
    cfg = load_yaml(args.config) if args.config else Config()
    cfg = resolve(override(cfg, parse_overrides(args.set)))
    if auto_cfg:
        # auto-loaded train.yaml may carry TPU-only perf settings (bf16 +
        # fused Pallas kernels) that would run in glacial interpret mode on
        # the CPU backend — strip them there (ADVICE r4)
        cfg = adapt_to_backend(cfg)

    model = build_model(cfg, "online_rnnt")
    params = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 80), np.float32),
        np.array([64], np.int32), np.zeros((1, 4), np.int32),
        np.array([4], np.int32),
    )
    if args.checkpoint:
        tx = make_optimizer(cfg.optim)
        state = restore_checkpoint_migrating(
            args.checkpoint, TrainState.create(params, tx),
            cfg.model.encoder.num_blocks)
        params = state.params

    manifest = export_streaming(
        model, params, cfg, args.out, batch=args.batch,
        max_tokens=args.max_tokens,
    )
    print(f"exported {sorted(manifest['functions'])} -> {args.out} "
          f"(batch={manifest['batch']}, window={manifest['window']})")

    if args.verify:
        fns = load_exported(args.out)
        window = manifest["window"]
        feat_dim = cfg.model.encoder.input_size
        win = np.zeros((args.batch, window, feat_dim), np.float32)

        from tpuasr.decode.rnnt_streaming import init_streaming_state

        stream_state = init_streaming_state(
            model, params, args.batch, cfg.streaming.chunk_size,
            cfg.streaming.num_left_chunks, cfg.model.blank_id, args.max_tokens,
        )
        out_state = fns["process_chunk"](win, stream_state)
        jax.block_until_ready(out_state)
        print("verify: process_chunk artifact executed one chunk ok")


if __name__ == "__main__":
    main()
