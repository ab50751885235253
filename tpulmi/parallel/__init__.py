from tpulmi.parallel.mesh import make_mesh
from tpulmi.parallel.sharded import (
    ShardedBucketStore,
    shard_store,
    sharded_probe_search,
    make_dp_train_step,
)

__all__ = [
    "make_mesh",
    "ShardedBucketStore",
    "shard_store",
    "sharded_probe_search",
    "make_dp_train_step",
]
