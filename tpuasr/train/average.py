"""Checkpoint averaging and partial initialization.

Parity: the wenet average_model tool and `load_trained_modules`
(wenet/utils/checkpoint.py:96-117 — initialize a subset of modules from a
pretrained checkpoint by path-prefix filtering)."""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np


def average_params(param_trees: Sequence) -> object:
    """Uniform average of N parameter pytrees (checkpoint averaging)."""
    assert len(param_trees) > 0
    n = float(len(param_trees))

    def avg(*xs):
        acc = np.sum([np.asarray(x, np.float64) for x in xs], axis=0) / n
        return acc.astype(np.asarray(xs[0]).dtype)

    return jax.tree.map(avg, *param_trees)


def average_checkpoints(paths: Sequence[str], target) -> object:
    """Average the `params` trees of several saved TrainStates/param trees."""
    from tpuasr.train.checkpoint import restore_checkpoint

    trees = [restore_checkpoint(p, target) for p in paths]
    params = [t.params if hasattr(t, "params") else t for t in trees]
    return average_params(params)


def load_partial(params, pretrained, prefixes: Sequence[str]):
    """Copy leaves from `pretrained` into `params` for paths whose dotted name
    starts with any prefix (e.g. ["params.encoder"]); shapes must match.
    Returns (new_params, copied_paths)."""
    flat_p = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    flat_src = {jax.tree_util.keystr(k): v
                for k, v in jax.tree_util.tree_flatten_with_path(pretrained)[0]}
    copied = []

    def norm(s):
        return s.replace("['", ".").replace("']", "").lstrip(".")

    src_by_name = {norm(k): v for k, v in flat_src.items()}
    out = {}
    for k, v in flat_p.items():
        name = norm(k)
        take = any(name.startswith(p) for p in prefixes)
        if take and name in src_by_name and src_by_name[name].shape == v.shape:
            out[k] = src_by_name[name]
            copied.append(name)
        else:
            out[k] = v
    # rebuild tree
    leaves_order = [out[jax.tree_util.keystr(k)] for k, _ in
                    jax.tree_util.tree_flatten_with_path(params)[0]]
    tree_def = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(tree_def, leaves_order), copied
