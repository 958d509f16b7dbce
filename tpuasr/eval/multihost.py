"""Cross-host evaluation aggregation.

SURVEY §7 hard-part 7: at multi-host scale each host decodes its own data
shard; CER must aggregate S/D/I *counts*, not strings. This sums CerCounts
across processes with one psum over the mesh (replacing the reference's
rank-0 gather patterns)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpuasr.text.cer import CerCounts


def allreduce_cer_counts(local: CerCounts) -> CerCounts:
    """Sum CER counts over all hosts (no-op with one process)."""
    if jax.process_count() == 1:
        return local
    from jax.experimental import multihost_utils

    vec = jnp.asarray(
        [local.substitutions, local.deletions, local.insertions, local.ref_len],
        jnp.int64 if jax.config.jax_enable_x64 else jnp.int32,
    )
    total = multihost_utils.process_allgather(vec).sum(axis=0)
    total = np.asarray(total)
    return CerCounts(int(total[0]), int(total[1]), int(total[2]), int(total[3]))
