"""Checkpoint / resume.

Parity with the reference protocol (run.py:164-179, rnnt_train.py:200-215):
save {params, optimizer state, step, epoch, train/test loss, plateau state}
every N epochs plus a rolling "latest"; restore resumes the LR schedule
position (scheduler.set_step parity comes free — the warmup schedule reads
state.step). Storage is orbax (pytree checkpointing, async-safe, multi-host
aware); a sibling JSON carries scalars + config snapshot like wenet's .yaml
info file (wenet/utils/checkpoint.py:52-60).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(path)


def save_checkpoint(path: str, state: Any, info: dict | None = None) -> None:
    """Save a pytree (TrainState or raw params) to `path` (a directory)."""
    path = _abs(path)
    ckptr = ocp.StandardCheckpointer()
    # device->host in ONE batched device_get (leaf-by-leaf np.asarray issues
    # a blocking RPC per leaf: 73 s for the 351 MB flagship state over the
    # tunnel vs 18 s batched — the r04 campaign silently spent ~70 s of
    # every epoch here on the per-epoch "latest" save)
    host_state = jax.device_get(_to_pytree(state))
    ckptr.save(path, jax.tree.map(np.asarray, host_state), force=True)
    ckptr.wait_until_finished()
    if info is not None:
        with open(path + ".json", "w") as f:
            json.dump(info, f, indent=2, default=float)


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure of `target` (same pytree shape)."""
    path = _abs(path)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, target=_to_pytree(target))
    return _from_pytree(restored, target)


def load_info(path: str) -> dict:
    with open(_abs(path) + ".json") as f:
        return json.load(f)


def _to_pytree(state):
    # TrainState is already a pytree; dicts/param-trees pass through
    return state


def _from_pytree(restored, target):
    return restored


def _walk(x, fn):
    """Structure-preserving recursion over a pytree of dicts / (named)tuples /
    lists / dataclass nodes, applying `fn` to every dict node (which may
    change its keys) before descending."""
    import dataclasses

    if isinstance(x, dict):
        return {k: _walk(v, fn) for k, v in fn(x).items()}
    if isinstance(x, tuple) and hasattr(x, "_fields"):  # NamedTuple
        return type(x)(*(_walk(v, fn) for v in x))
    if isinstance(x, (list, tuple)):
        return type(x)(_walk(v, fn) for v in x)
    if dataclasses.is_dataclass(x) and not isinstance(x, (np.ndarray, jax.Array)):
        return dataclasses.replace(
            x, **{f.name: _walk(getattr(x, f.name), fn)
                  for f in dataclasses.fields(x)})
    return x


def restore_checkpoint_migrating(path: str, target: Any, num_blocks: int) -> Any:
    """Restore a checkpoint into `target`, converting between the unrolled
    (block0..block{L-1}) and scanned (layers/block, stacked [L]) encoder
    parameter layouts if the stored layout differs (encoder.scan_layers flip
    — nn/conformer.py). Optimizer-moment trees mirror the params tree, so the
    same dict-level rewrite covers the whole TrainState."""
    from tpuasr.nn.conformer import stack_layer_params, unstack_layer_params

    try:
        return restore_checkpoint(path, target)
    except Exception as first_err:
        # A genuine failure (missing/corrupt checkpoint, wrong num_blocks)
        # must surface as ITS OWN error, not as a confusing mismatch from the
        # last migration attempt below (ADVICE r4). Keep going only when the
        # stored tree plausibly exists in the other layer layout.
        if not os.path.exists(path):
            raise
        orig_err = first_err

    def has_scanned(d):
        return isinstance(d.get("layers"), dict) and "block" in d["layers"]

    def has_unrolled(d):
        return "block0" in d and isinstance(d["block0"], dict)

    # target scanned <- checkpoint unrolled: restore into an unstacked view
    # of the target, then restack. (And the mirror case.)
    unstack = lambda d: unstack_layer_params(d, num_blocks) if has_scanned(d) else d
    stack = lambda d: stack_layer_params(d, num_blocks) if has_unrolled(d) else d
    alt_target = _walk(target, unstack)
    try:
        restored = restore_checkpoint(path, alt_target)
        return _walk(restored, stack)
    except Exception:
        # checkpoint scanned <- target unrolled
        alt_target = _walk(target, stack)
        try:
            restored = restore_checkpoint(path, alt_target)
        except Exception:
            # neither layout matched: the original failure is the real cause
            raise orig_err from None
        return _walk(restored, unstack)


def find_effective_config(ckpt_path: str) -> str | None:
    """Locate the resolved config train_loop persisted beside a checkpoint
    (save_dir/train.yaml — wenet train_utils.py:352-357 parity). Checked in
    the checkpoint dir itself, then its parent (checkpoints live one level
    under save_dir). Returns None if absent so CLIs fall back to flags."""
    ckpt_path = _abs(ckpt_path)
    for base in (ckpt_path, os.path.dirname(ckpt_path)):
        for name in ("train.yaml", "config.yaml"):
            cand = os.path.join(base, name)
            if os.path.exists(cand):
                return cand
    return None


def latest_path(save_dir: str, name: str = "latest") -> str:
    return os.path.join(save_dir, name)


def epoch_path(save_dir: str, epoch: int) -> str:
    return os.path.join(save_dir, f"epoch_{epoch:04d}")
