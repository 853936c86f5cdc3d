from tol_tpu.parallel.mesh import (
    make_mesh,
    shard_instances,
    sharded_batch_solve,
)
from tol_tpu.parallel.timeshard import (
    sharded_all_defects,
    sharded_constraint_norm,
)

__all__ = ["make_mesh", "shard_instances", "sharded_batch_solve",
           "sharded_all_defects", "sharded_constraint_norm"]
