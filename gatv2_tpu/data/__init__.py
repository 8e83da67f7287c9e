from gatv2_tpu.data.graph import Graph
from gatv2_tpu.data.io import load_dataset, resolve_dataset_dir
from gatv2_tpu.data.synthetic import random_graph

__all__ = ["Graph", "load_dataset", "resolve_dataset_dir", "random_graph"]
