from .mesh import (make_mesh, replicate, shard_batch, shard_fast_keys,
                   sharded_bootstrap)

__all__ = ["make_mesh", "replicate", "shard_batch", "shard_fast_keys",
           "sharded_bootstrap"]
