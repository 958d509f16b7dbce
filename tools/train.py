#!/usr/bin/env python
"""Unified training CLI for all three workloads.

Parity: run.py (CTC), rnnt_train.py (offline RNN-T), online_rnnt_train.py
(streaming RNN-T) — one driver, workload selected by flag:

    python tools/train.py --workload ctc|rnnt|online_rnnt \\
        [--config cfg.yaml] [--set model.encoder.num_blocks=6 ...] \\
        [--synthetic N] [--data_root DIR] [--epochs E]

Multi-host: launch one process per host with `jax.distributed` env vars set;
data shards per host automatically (deterministic steps-per-epoch — no
barrier machinery needed, SURVEY §2.7 elastic row).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_overrides(pairs):
    out = {}
    for p in pairs or []:
        k, _, v = p.partition("=")
        try:
            import ast

            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[k] = v
    return out


def build_model(cfg, workload):
    from tpuasr.models import Transducer

    m = cfg.model
    if workload == "aed":
        # hybrid CTC + attention (wenet ASRModel role)
        from tpuasr.models.asr_model import AEDConfig, ASRModel

        d = m.att_decoder
        return ASRModel(AEDConfig(
            vocab_size=m.vocab_size, blank_id=m.blank_id,
            ctc_weight=m.ctc_weight, lsm_weight=d.lsm_weight,
            decoder_blocks=d.blocks, decoder_heads=d.heads, decoder_ffn=d.ffn,
            r_decoder_blocks=d.r_blocks, reverse_weight=d.reverse_weight,
            apply_non_blank_embedding=d.apply_non_blank_embedding,
            compute_dtype=m.compute_dtype, encoder=m.encoder,
        ))
    if workload == "paraformer":
        # non-autoregressive CIF decoder (wenet paraformer role); the SANM
        # stack is selected through model.encoder.encoder_type=sanm
        from tpuasr.models.paraformer import Paraformer, ParaformerConfig

        d = m.att_decoder
        return Paraformer(ParaformerConfig(
            vocab_size=m.vocab_size, lsm_weight=d.lsm_weight,
            decoder_blocks=d.blocks, decoder_heads=d.heads, decoder_ffn=d.ffn,
            sampler=d.sampler, sampling_ratio=d.sampling_ratio,
            compute_dtype=m.compute_dtype, encoder=m.encoder,
            encoder_type="sanm" if m.encoder.encoder_type == "sanm" else "conformer",
        ))
    if workload == "online_rnnt":
        m.encoder.causal = True
        m.encoder.use_dynamic_chunk = True
        if m.encoder.static_chunk_size == 0:
            m.encoder.static_chunk_size = cfg.streaming.chunk_size
    return Transducer(m)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workload",
                    choices=["ctc", "rnnt", "online_rnnt", "aed", "paraformer"],
                    default="online_rnnt")
    ap.add_argument("--config", default=None)
    ap.add_argument("--set", nargs="*", default=[], help="dotted overrides k=v")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="train on N synthetic utterances instead of BZNSYP")
    ap.add_argument("--data_root", default="")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--resume", default=None)
    args = ap.parse_args()

    import jax

    from tpuasr.utils.compile_cache import enable_compilation_cache, enable_stack_dumps

    enable_stack_dumps()
    enable_compilation_cache()  # TPUASR_COMPILE_CACHE=off to disable

    from tpuasr.config import (
        Config, adapt_to_backend, layer_yaml, override, resolve, summarize,
    )
    from tpuasr.parallel import make_mesh
    from tpuasr.text import Tokenizer
    from tpuasr.train import TrainState, make_optimizer, make_train_step
    from tpuasr.train.loop import train_loop

    cfg = Config()
    if jax.default_backend() == "tpu":
        # flagship TPU fast path by default (VERDICT r3 weak#1): bf16 compute
        # with fp32 params, Pallas fused joint+loss and fused rel-pos
        # attention — the bench configuration (__graft_entry__._flagship_config)
        # without --set flags. Yaml/--set layers on top and can override;
        # incompatible configs (hat_joint, attention dropout, cached decode)
        # fall back automatically at the consumption sites.
        cfg.model.compute_dtype = "bfloat16"
        cfg.model.fused_joint_loss = True
        cfg.model.encoder.fused_attention = True
        cfg.feature.fbank_precision = "default"  # single-pass bf16 DFT/mel
        # scan_layers stays off: measured slower device-resident than the
        # unrolled stack (docs/RESULTS.md round-4 layer-layout table)
    if args.resume and args.config is None:
        # resume continuity (ADVICE r4 medium): without this, resuming a
        # checkpoint trained fp32/'highest' on a TPU host would silently
        # continue on the platform-default fast path (bf16 compute, fused
        # kernels, single-pass fbank) — different numerics and different
        # input features mid-run, with no warning since the param structure
        # matches. Auto-load the persisted effective config like the eval
        # CLIs do; an explicit --config still wins.
        from tpuasr.train.checkpoint import find_effective_config

        args.config = find_effective_config(args.resume)
        auto_cfg = args.config is not None
        if auto_cfg:
            print(f"resume: effective config {args.config}")
    else:
        auto_cfg = False
    if args.config:
        cfg = layer_yaml(cfg, args.config)
    cfg = resolve(override(cfg, parse_overrides(args.set)))
    if auto_cfg:
        # auto-loaded configs may carry TPU-only perf settings — strip them
        # on non-TPU backends (interpret-mode Pallas is glacial; ADVICE r4)
        cfg = adapt_to_backend(cfg)

    if args.synthetic:
        from tpuasr.data.corpus import synthetic_pipeline

        tokenizer = Tokenizer(tokens=[f"syl{i}" for i in range(cfg.model.vocab_size - 6)])
        train_pipe = synthetic_pipeline(cfg, args.synthetic, seed=0)
        dev_pipe = synthetic_pipeline(cfg, max(args.synthetic // 8, 4), seed=1)
    else:
        from tpuasr.data.corpus import make_pipeline, scan_split

        tokenizer = Tokenizer(cfg.data.vocab_file if os.path.exists(cfg.data.vocab_file) else None)
        cfg.model.vocab_size = tokenizer.size
        train_items = scan_split(cfg.data.train_wav_scp, cfg.data.train_text,
                                 tokenizer, args.data_root)
        dev_items = scan_split(cfg.data.dev_wav_scp, cfg.data.dev_text,
                               tokenizer, args.data_root)
        kw = dict(host_id=jax.process_index(), num_hosts=jax.process_count())
        train_pipe = make_pipeline(train_items, cfg, **kw)
        dev_pipe = make_pipeline(dev_items, cfg, **kw)

    if args.workload == "ctc":
        # CTC-only: keep the Transducer assembly but zero the rnnt branch? No —
        # use the dedicated small CTCModel (model/model.py parity).
        print(summarize(cfg))  # no workload mutation on this path
        _train_ctc(cfg, tokenizer, train_pipe, dev_pipe, args)
        return

    model = build_model(cfg, args.workload)
    # effective-config dump AFTER build_model's workload mutation (VERDICT r3
    # missing#2): the online_rnnt workload flips encoder.causal /
    # use_dynamic_chunk at build time, so dumping earlier records the wrong
    # architecture. The loop also persists this as save_dir/train.yaml
    # (wenet train_utils.py:352-357 parity) for reproducible inference.
    print(summarize(cfg))
    first = next(iter(train_pipe.batches(0)))
    feats_t = 1 + first["waves"].shape[1] // cfg.feature.hop_length
    b = first["waves"].shape[0]
    params = model.init(
        jax.random.PRNGKey(cfg.train.seed),
        np.zeros((b, feats_t, 80), np.float32), np.full((b,), feats_t, np.int32),
        first["texts"], first["text_lens"],
    )
    tx = make_optimizer(cfg.optim)
    state = TrainState.create(params, tx)
    start_epoch, plateau_init = 0, None
    if args.resume:
        from tpuasr.train.checkpoint import load_info, restore_checkpoint_migrating

        # migrating restore: converts pre-scan (unrolled block{i}) checkpoints
        # into the scan_layers layout and vice versa
        state = restore_checkpoint_migrating(args.resume, state,
                                             cfg.model.encoder.num_blocks)
        try:
            # resume-by-restart (run.py:164-179 parity): continue from the
            # checkpointed epoch with the plateau tracker's decayed state
            info = load_info(args.resume)
            start_epoch = int(info.get("epoch", -1)) + 1
            plateau_init = info.get("plateau")
        except FileNotFoundError:
            pass
        print(f"resumed from {args.resume}: step {int(state.step)}, "
              f"starting at epoch {start_epoch}")

    mesh = make_mesh(model_parallel_size=cfg.mesh.model_parallel_size)
    import contextlib

    with jax.set_mesh(mesh) if len(jax.devices()) > 1 else contextlib.nullcontext():
        result = train_loop(cfg, model, state, train_pipe, dev_pipe,
                            mesh=mesh if len(jax.devices()) > 1 else None,
                            epochs=args.epochs, start_epoch=start_epoch,
                            plateau_init=plateau_init,
                            restart_hook=_make_restart_hook(cfg))
    print("final train loss:", result.train_losses[-1] if result.train_losses else None)


def _make_restart_hook(cfg):
    """Exec-restart for the train_loop host-RSS watchdog (train.max_rss_gb):
    re-launch this exact command with --resume save_dir/latest so the run
    survives the tunnel client's per-execute host leak instead of being
    OOM-killed (the r04 campaign died at epoch 43 this way). Guard: if the
    previous exec-restart happened at this same epoch (no progress since),
    fall through and let the run take its chances rather than exec-loop."""

    def hook(epoch):
        prev = os.environ.get("TPUASR_RESTART_EPOCH")
        if prev is not None and int(prev) >= epoch:
            print(f"watchdog: no epoch progress since restart at {prev}; "
                  "not restarting again")
            return
        argv, skip = [], False
        for a in sys.argv:
            if skip:
                skip = False
                continue
            if a == "--resume":
                skip = True
                continue
            if a.startswith("--resume="):
                continue
            argv.append(a)
        argv += ["--resume", os.path.join(cfg.train.save_dir, "latest")]
        os.environ["TPUASR_RESTART_EPOCH"] = str(epoch)
        sys.stdout.flush()
        sys.stderr.flush()
        os.execv(sys.executable, [sys.executable] + argv)

    return hook


def _train_ctc(cfg, tokenizer, train_pipe, dev_pipe, args):
    """CTC workload on the dedicated small conformer (run.py parity)."""
    import jax

    from tpuasr.audio import fbank_batch
    from tpuasr.models import CTCModel
    from tpuasr.train import TrainState, make_optimizer
    from tpuasr.train.loop import train_loop

    model = CTCModel(cfg.ctc_model, cfg.model.vocab_size, cfg.model.blank_id)
    first = next(iter(train_pipe.batches(0)))
    feats_t = 1 + first["waves"].shape[1] // cfg.feature.hop_length
    b = first["waves"].shape[0]
    params = model.init(
        jax.random.PRNGKey(cfg.train.seed),
        np.zeros((b, feats_t, 80), np.float32), np.full((b,), feats_t, np.int32),
        first["texts"], first["text_lens"],
    )
    tx = make_optimizer(cfg.optim)
    state = TrainState.create(params, tx)

    import optax

    def step_fn(state, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(p):
            feats, feat_lens = fbank_batch(batch["waves"], batch["wave_lens"], cfg.feature)
            _, _, loss = model.apply(
                {"params": p, **{k: v for k, v in state.params.items() if k != "params"}},
                feats, feat_lens, batch["texts"], batch["text_lens"],
                deterministic=False, rngs={"dropout": rng},
            )
            return loss

        (loss), grads = jax.value_and_grad(loss_fn)(state.params["params"])
        gn = optax.global_norm(grads)
        finite = jax.numpy.isfinite(loss) & jax.numpy.isfinite(gn)
        if hasattr(tx, "update_guarded"):
            new_params, opt_state = tx.update_guarded(
                grads, state.opt_state, state.params["params"], finite,
                lr_scale=state.lr_scale, grad_norm=gn,
            )
        else:
            updates, opt_state = tx.update(grads, state.opt_state, state.params["params"])
            updates = jax.tree.map(lambda u: u * state.lr_scale, updates)
            new_params = optax.apply_updates(state.params["params"], updates)
            sel = lambda a, b2: jax.tree.map(
                lambda x, y: jax.numpy.where(finite, x, y), a, b2)
            new_params = sel(new_params, state.params["params"])
            opt_state = sel(opt_state, state.opt_state)
        return state.replace(
            params={**state.params, "params": new_params},
            opt_state=opt_state,
            step=state.step + 1,
            skipped=state.skipped + (1 - finite.astype(jax.numpy.int32)),
        ), {
            "loss": loss, "grad_norm": gn, "finite": finite,
            "audio_seconds": jax.numpy.sum(batch["wave_lens"]) / cfg.feature.sample_rate,
        }

    step_fn = jax.jit(step_fn)

    def eval_fn(variables, batch, rng):
        feats, feat_lens = fbank_batch(batch["waves"], batch["wave_lens"], cfg.feature)
        _, _, loss = model.apply(variables, feats, feat_lens, batch["texts"], batch["text_lens"])
        return {"loss": loss}

    eval_fn = jax.jit(eval_fn)
    result = train_loop(cfg, model, state, train_pipe, dev_pipe,
                        step_fn=step_fn, eval_fn=eval_fn, epochs=args.epochs)
    print("final train loss:", result.train_losses[-1] if result.train_losses else None)


if __name__ == "__main__":
    main()
