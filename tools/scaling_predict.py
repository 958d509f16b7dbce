#!/usr/bin/env python
"""Predict multi-host scaling efficiency from the compiled train step's HLO.

VERDICT r4 next#8 / BASELINE.md north star (≥80% efficiency at N ≥ 2 hosts):
compiles the FULL flagship train step SPMD-partitioned over a virtual
(hosts × chips) mesh, extracts every collective's per-device payload bytes
from the optimized HLO, and costs them over ICI/DCN with the ring +
hierarchical model in tpuasr/parallel/scaling.py. Only the link bandwidths
are assumptions — the bytes are what XLA actually emits.

    python tools/scaling_predict.py --chips 4 --hosts 2 \
        [--layouts dp zero1 zero3 dptp] [--hosts-extrapolate 2 4 8] \
        [--compute-ms 9.99] [--batch-per-device 12] [--frames 768]

Runs on CPU (forces the host platform before importing jax) — kernel fusion
flags stay off because Pallas kernels do not change parameter count,
shardings, or collective traffic; the partitioned einsum path emits the same
gradient/TP collectives.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--chips", type=int, default=4, help="chips per host")
    ap.add_argument("--hosts", type=int, default=2, help="hosts in the compiled mesh")
    ap.add_argument("--layouts", nargs="*",
                    default=["dp", "zero1", "zero3", "dptp"])
    ap.add_argument("--hosts-extrapolate", type=int, nargs="*", default=[2, 4, 8])
    ap.add_argument("--compute-ms", type=float, default=9.99,
                    help="measured single-chip device step (docs/RESULTS.md)")
    ap.add_argument("--batch-per-device", type=int, default=12)
    ap.add_argument("--frames", type=int, default=768)
    ap.add_argument("--tokens", type=int, default=40)
    ap.add_argument("--ici-gbps", type=float, default=45.0)
    ap.add_argument("--dcn-gbps", type=float, default=25.0)
    ap.add_argument("--json", action="store_true", help="machine-readable output")
    args = ap.parse_args()

    n_dev = args.chips * args.hosts
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_dev}").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu"
    devices = jax.devices()[:n_dev]
    assert len(devices) == n_dev, (len(devices), n_dev)

    import numpy as np

    from tpuasr.config import Config
    from tpuasr.models import Transducer
    from tpuasr.parallel import (
        make_mesh, shard_batch, shard_train_state, train_state_shardings,
    )
    from tpuasr.parallel.scaling import (
        parse_collectives, predict, rescale_for_hosts,
    )
    from tpuasr.train import TrainState, make_optimizer, make_train_step

    cfg = Config()
    cfg.model.compute_dtype = "bfloat16"
    cfg.model.encoder.causal = True
    cfg.model.encoder.use_dynamic_chunk = True
    cfg.model.encoder.static_chunk_size = 32

    b = args.batch_per_device * n_dev
    samples = args.frames * cfg.feature.hop_length
    batch = {
        "waves": np.zeros((b, samples), np.float32),
        "wave_lens": np.full((b,), samples, np.int32),
        "texts": np.full((b, args.tokens), 7, np.int32),
        "text_lens": np.full((b,), args.tokens, np.int32),
    }

    results = {}
    for layout in args.layouts:
      try:
        mp = 2 if layout == "dptp" else 1
        cfg.model.shard_joint = layout == "dptp"
        cfg.mesh.zero_stage = {"zero1": "zero1", "zero3": "zero3"}.get(layout, "none")
        model = Transducer(cfg.model)
        mesh = make_mesh(devices, model_parallel_size=mp)
        feats_t = 1 + samples // cfg.feature.hop_length
        with jax.set_mesh(mesh):
            # init batch must divide the data axis (shard_joint constrains
            # the joint logits' batch dim when the mesh is set)
            bi = n_dev
            params = model.init(
                jax.random.PRNGKey(0),
                np.zeros((bi, feats_t, 80), np.float32),
                np.full((bi,), feats_t, np.int32),
                batch["texts"][:bi], batch["text_lens"][:bi])
            tx = make_optimizer(cfg.optim)
            state = TrainState.create(params, tx)
            shardings = None
            if cfg.mesh.zero_stage != "none":
                shardings = train_state_shardings(state, mesh, cfg.mesh.zero_stage)
                state = shard_train_state(state, shardings)
            step = make_train_step(model, tx, cfg, donate=False,
                                   state_shardings=shardings)
            sharded = shard_batch(batch, mesh)
            print(f"[{layout}] lowering + compiling over "
                  f"{args.hosts}x{args.chips} mesh ...", file=sys.stderr)
            compiled = step.lower(state, sharded, jax.random.PRNGKey(1)).compile()
        hlo = "\n".join(m.to_string() for m in compiled.runtime_executable().hlo_modules()) \
            if hasattr(compiled, "runtime_executable") else compiled.as_text()
        colls = parse_collectives(hlo, n_dev)
        rows = []
        for h in args.hosts_extrapolate:
            scaled = rescale_for_hosts(colls, args.chips, args.hosts, h)
            rows.append(predict(scaled, args.chips, h, args.compute_ms,
                                args.ici_gbps, args.dcn_gbps))
        results[layout] = {
            "n_collectives": len(colls),
            "ops": sorted({c.op for c in colls}),
            "rows": rows,
        }
      except Exception as e:  # keep the other layouts' results
        results[layout] = {"error": f"{type(e).__name__}: {e}"}

    if args.json:
        print(json.dumps(results, indent=1))
        return
    print(f"\ncompute = {args.compute_ms} ms/step (measured single-chip), "
          f"ICI {args.ici_gbps} GB/s/chip, DCN {args.dcn_gbps} GB/s/host")
    for layout, r in results.items():
        if "error" in r:
            print(f"\n== {layout} FAILED: {r['error']} ==")
            continue
        print(f"\n== {layout} ({r['n_collectives']} collectives: "
              f"{', '.join(r['ops'])}) ==")
        print(f"{'hosts':>6} {'ICI MB':>8} {'DCN MB':>8} {'t_ici ms':>9} "
              f"{'t_dcn ms':>9} {'eff(no-ovl)':>12} {'eff(ovl)':>9}")
        for row in r["rows"]:
            print(f"{row['hosts']:>6} {row['ici_mb']:>8.2f} {row['dcn_mb']:>8.2f} "
                  f"{row['t_ici_ms']:>9.3f} {row['t_dcn_ms']:>9.3f} "
                  f"{row['eff_no_overlap']:>12.1%} {row['eff_full_overlap']:>9.1%}")


if __name__ == "__main__":
    main()
