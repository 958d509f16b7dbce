from tpuasr.parallel.decode import make_sharded_streaming_decode
from tpuasr.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from tpuasr.parallel.zero import (
    assert_sharded,
    shard_train_state,
    train_state_shardings,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "train_state_shardings",
    "shard_train_state",
    "assert_sharded",
    "make_sharded_streaming_decode",
]
