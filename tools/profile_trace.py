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
    ap.add_argument("--scan", action="store_true",
                    help="encoder.scan_layers: one scanned block body instead "
                         "of num_blocks unrolled clones")
    ap.add_argument("--scan_unroll", type=int, default=1,
                    help="layer bodies per while-loop trip (scan_layers only)")
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--frames", type=int, default=768)
    ap.add_argument("--hlo", default="",
                    help="also dump the optimized HLO text here (op names in "
                         "the trace — fusion.NNNN — resolve against it)")
    ap.add_argument("--no_donate", action="store_true",
                    help="disable buffer donation (default matches bench.py: "
                         "donated, rbg rng)")
    args = ap.parse_args()

    import jax

    from tpuasr.config import Config
    from tpuasr.data.pipeline import BatchSpec, device_view, make_batch
    from tpuasr.data.synthetic import synth_corpus
    from tpuasr.models import Transducer
    from tpuasr.train import TrainState, make_optimizer, make_train_step

    cfg = Config()  # 48 kHz corpus protocol (matches bench.py)
    cfg.model.compute_dtype = "bfloat16"
    cfg.model.encoder.causal = True
    cfg.model.encoder.use_dynamic_chunk = True
    cfg.model.encoder.static_chunk_size = 32
    cfg.model.fused_joint_loss = args.fused
    cfg.model.encoder.fused_attention = args.fused
    if args.fused:
        cfg.feature.fbank_precision = "default"
    cfg.model.encoder.scan_layers = args.scan
    cfg.model.encoder.scan_unroll = args.scan_unroll

    model = Transducer(cfg.model)
    bsz, frames = args.batch, args.frames
    utts = synth_corpus(bsz, cfg.model.vocab_size, seed=0, min_tokens=24, max_tokens=30,
                        sample_rate=cfg.feature.sample_rate,
                        samples_per_token=(frames - 6) * 512 // 30)
    batch = device_view(make_batch(utts, BatchSpec(bsz, (frames - 1) * 512, 32)))
    feats_t = 1 + batch["waves"].shape[1] // 512
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((bsz, feats_t, 80), np.float32),
                        np.full(bsz, feats_t, np.int32),
                        batch["texts"], batch["text_lens"])
    tx = make_optimizer(cfg.optim)
    state = TrainState.create(params, tx)
    # match bench.py's measured configuration: donated buffers + hardware-RBG
    # rng (donate=False + threefry measures ~5 ms/step slower and would
    # misattribute the overhead to the model)
    step = make_train_step(model, tx, cfg, donate=not args.no_donate)
    from tpuasr.utils.rng import root_key

    rng = root_key(1, cfg.train.rng_impl)

    # AOT-compile once; the executable serves the HLO dump and the timed steps
    step = step.lower(state, batch, rng).compile()
    if args.hlo:
        with open(args.hlo, "w") as f:
            f.write(step.as_text())
        print(f"optimized HLO written to {args.hlo}")

    state, m = step(state, batch, rng)
    jax.block_until_ready(m["loss"])
    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            state, m = step(state, batch, rng)
        jax.block_until_ready(m["loss"])
    print(f"trace written to {args.out}")

    audio_s = float(np.sum(batch["wave_lens"])) / cfg.feature.sample_rate
    report_device_time(args.out, args.steps, audio_s)


def report_device_time(trace_dir: str, n_steps: int, audio_s_per_step: float,
                       out=None):
    """Parse the captured trace and print the *device-resident* time per
    train step (sum of the jit_train_step spans on the TPU timeline).

    On the time-shared chip, external tenants appear as gaps BETWEEN
    programs, not inflated op durations — so device time per step is a
    contention-immune throughput measurement where wall-clock (bench.py) is
    a lottery. Also prints the top op families by device time.

    Returns the device-resident ms/step (None when the trace has no TPU
    jit_train_step spans) so callers (bench.py) can embed it in their JSON."""
    import collections
    import glob
    import gzip
    import json
    import re

    out = out or sys.stdout
    paths = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace json found; skipping device-time report", file=out)
        return None
    with gzip.open(sorted(paths)[-1]) as f:
        events = json.load(f)["traceEvents"]
    names = {e["pid"]: e["args"]["name"] for e in events
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in names.items() if "TPU" in n}
    step_ms = 0.0
    fam_ms: collections.Counter = collections.Counter()
    fam_n: collections.Counter = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e["name"]
        dur = e.get("dur", 0) / 1e3
        if name.startswith("jit_train_step"):
            step_ms += dur
        elif not re.fullmatch(r"\d+", name):  # skip step-group spans
            fam = re.sub(r"[.\d]+$", "", name)
            fam_ms[fam] += dur
            fam_n[fam] += 1
    per_step = step_ms / max(n_steps, 1)
    if per_step <= 0.0:
        print("no jit_train_step spans on a TPU timeline in this trace; "
              "skipping device-time report", file=out)
        return None
    print(f"device time: {per_step:.2f} ms/step "
          f"({audio_s_per_step / per_step * 1e3:.0f} audio-s/s/chip device-limited)",
          file=out)
    print("top op families (device ms per step):", file=out)
    for fam, ms in fam_ms.most_common(12):
        print(f"  {ms / max(n_steps, 1):7.3f} ms x{fam_n[fam] // max(n_steps, 1):<6d} {fam[:80]}",
              file=out)
    return per_step


if __name__ == "__main__":
    main()
