#!/usr/bin/env python
"""Streaming evaluation CLI (online_rnnt_eval.py parity): chunked greedy and
beam CER + relative improvement."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--split", choices=["dev", "test"], default="dev")
    ap.add_argument("--beam_size", type=int, default=4)
    ap.add_argument("--config", default=None)
    ap.add_argument("--set", nargs="*", default=[])
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--seed", type=int, default=1,
                    help="synthetic corpus seed (train pipes use 0, dev 1 — tools/train.py)")
    ap.add_argument("--data_root", default="")
    args = ap.parse_args()

    import jax

    from tpuasr.utils.compile_cache import enable_compilation_cache, enable_stack_dumps

    enable_stack_dumps()
    enable_compilation_cache()  # TPUASR_COMPILE_CACHE=off to disable

    from tools.train import build_model, parse_overrides
    from tpuasr.config import Config, adapt_to_backend, load_yaml, override, resolve
    from tpuasr.eval import evaluate_streaming
    from tpuasr.text import Tokenizer
    from tpuasr.train import TrainState, make_optimizer
    from tpuasr.train.checkpoint import (
        find_effective_config, restore_checkpoint_migrating,
    )

    auto_cfg = args.config is None
    if auto_cfg:
        # train_loop persists the resolved post-mutation config next to the
        # checkpoints; load it so eval needs no architecture flags
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

    if args.synthetic:
        from tpuasr.data.corpus import synthetic_pipeline

        tokenizer = Tokenizer(tokens=[f"syl{i}" for i in range(cfg.model.vocab_size - 6)])
        pipe = synthetic_pipeline(cfg, args.synthetic, seed=args.seed)
    else:
        from tpuasr.data.corpus import make_pipeline, scan_split

        tokenizer = Tokenizer(cfg.data.vocab_file)
        cfg.model.vocab_size = tokenizer.size
        scp = cfg.data.dev_wav_scp if args.split == "dev" else cfg.data.test_wav_scp
        txt = cfg.data.dev_text if args.split == "dev" else cfg.data.test_text
        pipe = make_pipeline(scan_split(scp, txt, tokenizer, args.data_root), cfg)

    model = build_model(cfg, "online_rnnt")
    first = next(iter(pipe.batches(0)))
    feats_t = 1 + first["waves"].shape[1] // cfg.feature.hop_length
    b = first["waves"].shape[0]
    params0 = model.init(
        jax.random.PRNGKey(0),
        np.zeros((b, feats_t, 80), np.float32), np.full((b,), feats_t, np.int32),
        first["texts"], first["text_lens"],
    )
    tx = make_optimizer(cfg.optim)
    state = restore_checkpoint_migrating(
        args.checkpoint, TrainState.create(params0, tx),
        cfg.model.encoder.num_blocks)

    res = evaluate_streaming(model, state.params, pipe.batches(0), cfg, tokenizer,
                             beam_size=args.beam_size)
    print(f"streaming greedy CER {100 * res.greedy.cer:.2f}%")
    print(f"streaming beam-{args.beam_size} CER {100 * res.beam.cer:.2f}%")
    print(f"relative improvement {100 * res.relative_improvement:.2f}%")
    for utt, ref, g, b_ in res.samples:
        print(f"  [{utt}] REF:    {ref}")
        print(f"  [{utt}] GREEDY: {g}")
        print(f"  [{utt}] BEAM:   {b_}")


if __name__ == "__main__":
    main()
