from gatv2_tpu.parallel.partition import PartitionedGraph, partition_graph
from gatv2_tpu.parallel.mesh import make_mesh
from gatv2_tpu.parallel.sharded import make_sharded_train_step, make_sharded_eval_step

__all__ = [
    "PartitionedGraph",
    "partition_graph",
    "make_mesh",
    "make_sharded_train_step",
    "make_sharded_eval_step",
]
