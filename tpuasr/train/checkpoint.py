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
    ckptr.save(path, jax.tree.map(np.asarray, _to_pytree(state)), force=True)
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


def latest_path(save_dir: str, name: str = "latest") -> str:
    return os.path.join(save_dir, name)


def epoch_path(save_dir: str, epoch: int) -> str:
    return os.path.join(save_dir, f"epoch_{epoch:04d}")
