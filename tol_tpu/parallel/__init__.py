from tol_tpu.parallel.mesh import (
    make_mesh,
    shard_instances,
    sharded_batch_solve,
)

__all__ = ["make_mesh", "shard_instances", "sharded_batch_solve"]
