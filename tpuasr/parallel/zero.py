"""ZeRO-style optimizer-state / parameter sharding over the data axis.

Parity: the reference vendors torch FSDP wrapping with strategies
no_shard / model / zero2 (SHARD_GRAD_OP) / zero3 (FULL_SHARD)
(wenet/utils/fsdp_utils.py:38-115, train_utils.py:217-249) plus DeepSpeed
ZeRO configs (train_utils.py:197-214). TPU-native re-expression: no wrapper
modules, no gather/scatter hooks — each TrainState leaf gets a
`NamedSharding` that splits its largest divisible dimension over the mesh's
`data` axis, the state is `device_put` to that layout once, and XLA's SPMD
partitioner inserts the all-gathers / dynamic-slices inside the jitted train
step.

Stages:
- "none":  params + optimizer state replicated (plain DP / DDP analog);
- "zero1": optimizer moments sharded, params + grads replicated — each
  device updates only its slice of mu/nu and the params all-gather the
  sharded update (DeepSpeed stage-1 / FSDP SHARD_GRAD_OP's state half);
- "zero3": parameters sharded too (FSDP FULL_SHARD analog) — weights
  all-gather on use inside the forward/backward.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

STAGES = ("none", "zero1", "zero3")


def leaf_spec(shape, n_shards: int, axis_name: str = "data") -> P:
    """Split the largest dimension divisible by n_shards; replicate if none."""
    best = -1
    for i, d in enumerate(shape):
        if d % n_shards == 0 and d > 0 and (best < 0 or d > shape[best]):
            best = i
    if best < 0:
        return P()
    return P(*[axis_name if i == best else None for i in range(len(shape))])


def tree_shardings(tree, mesh: Mesh, axis_name: str = "data"):
    """Pytree of NamedShardings splitting each leaf's largest dim."""
    n = mesh.shape[axis_name]

    def f(x):
        shape = getattr(x, "shape", ())
        return NamedSharding(mesh, leaf_spec(tuple(shape), n, axis_name))

    return jax.tree.map(f, tree)


def replicated_tree(tree, mesh: Mesh):
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda _: repl, tree)


def train_state_shardings(state, mesh: Mesh, stage: str = "zero1",
                          axis_name: str = "data"):
    """Sharding pytree (same structure as TrainState) for the given stage."""
    assert stage in STAGES, stage
    repl = NamedSharding(mesh, P())
    params_sh = (
        tree_shardings(state.params, mesh, axis_name)
        if stage == "zero3" else replicated_tree(state.params, mesh)
    )
    opt_sh = (
        tree_shardings(state.opt_state, mesh, axis_name)
        if stage in ("zero1", "zero3") else replicated_tree(state.opt_state, mesh)
    )
    return state.replace(
        params=params_sh, opt_state=opt_sh,
        step=repl, lr_scale=repl, skipped=repl,
    )


def shard_train_state(state, shardings):
    """Place a (host / replicated) TrainState into the ZeRO layout."""
    return jax.device_put(state, shardings)


def assert_sharded(state, mesh: Mesh, stage: str, axis_name: str = "data"):
    """Check that the big optimizer-moment leaves are actually split: each
    device holds ~1/n of every shardable leaf (dryrun / test gate)."""
    if stage == "none":
        return
    n = mesh.shape[axis_name]
    checked = 0
    for leaf in jax.tree.leaves(state.opt_state):
        if not hasattr(leaf, "sharding") or leaf.ndim == 0:
            continue
        if all(d % n != 0 for d in leaf.shape):
            continue  # unsplittable leaf stays replicated
        shard_shape = leaf.sharding.shard_shape(leaf.shape)
        assert int(np.prod(shard_shape)) * n == int(np.prod(leaf.shape)), (
            leaf.shape, shard_shape, n,
        )
        checked += 1
    assert checked > 0, "no optimizer leaf was sharded"
