from gatv2_tpu.parallel.partition import (
    PartitionedGraph,
    partition_graph,
    prepare_partitioned_tiles,
)
from gatv2_tpu.parallel.mesh import make_mesh
from gatv2_tpu.parallel.sharded import (
    ShardedTrainer,
    make_sharded_train_step,
    make_sharded_eval_step,
    make_sharded_multi_epoch_runner,
)
from gatv2_tpu.parallel import multihost

__all__ = [
    "PartitionedGraph",
    "partition_graph",
    "prepare_partitioned_tiles",
    "make_mesh",
    "ShardedTrainer",
    "make_sharded_train_step",
    "make_sharded_eval_step",
    "make_sharded_multi_epoch_runner",
    "multihost",
]
