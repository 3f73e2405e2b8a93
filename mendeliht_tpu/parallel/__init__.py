"""Device-mesh parallelism: single-process sharding (mesh, sharded_ops) and
multi-host distributed execution (multihost)."""

from .mesh import (make_mesh, geno_sharding, state_sharding, shard_state,
                   shard_geno_op, shard_data)
from .sharded_ops import ShardedPackedOp
from . import multihost

__all__ = ["make_mesh", "geno_sharding", "state_sharding", "shard_state",
           "shard_geno_op", "shard_data", "ShardedPackedOp", "multihost"]
