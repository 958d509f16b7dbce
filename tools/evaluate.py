#!/usr/bin/env python
"""Offline evaluation CLI (rnnt_eval.py parity): decode dev/test and report
corpus CER with S/D/I breakdown and REF/HYP samples. Transducer workloads
decode with CTC greedy / RNN-T greedy / RNN-T beam; the aed workload adds
CTC prefix beam / attention beam / attention rescoring (wenet
ASRModel.decode dispatch); the paraformer workload decodes NAR greedy/beam."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--workload",
                    choices=["rnnt", "online_rnnt", "aed", "paraformer"],
                    default="rnnt")
    ap.add_argument("--mode",
                    choices=["ctc_greedy", "rnnt_greedy", "rnnt_beam",
                             "rnnt_rescoring", "ctc_prefix_beam", "attention",
                             "attention_rescoring", "paraformer_greedy",
                             "paraformer_beam"],
                    default="rnnt_greedy")
    ap.add_argument("--split", choices=["dev", "test"], default="dev")
    ap.add_argument("--beam_size", type=int, default=4)
    ap.add_argument("--ctc_fusion_weight", type=float, default=0.0,
                    help="rnnt_beam: per-frame CTC shallow fusion weight "
                         "(prefix_beam_search.py:99-101 parity)")
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
    from tpuasr.eval import evaluate_offline
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

    model = build_model(cfg, args.workload)
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

    res = evaluate_offline(model, state.params, pipe.batches(0), cfg, tokenizer,
                           mode=args.mode, beam_size=args.beam_size,
                           ctc_fusion_weight=args.ctc_fusion_weight)
    c = res.counts
    print(f"CER {100 * c.cer:.2f}%  (S={c.substitutions} D={c.deletions} "
          f"I={c.insertions} N={c.ref_len})")
    for utt, ref, hyp in res.samples:
        print(f"  [{utt}] REF: {ref}")
        print(f"  [{utt}] HYP: {hyp}")


if __name__ == "__main__":
    main()
