from occ_gnn_tpu.data.graph import Graph
from occ_gnn_tpu.data.binary_format import save_graph, load_graph, read_meta
from occ_gnn_tpu.data.synthetic import random_graph, block_graph
from occ_gnn_tpu.data.partition import partition_graph

__all__ = [
    "Graph",
    "save_graph",
    "load_graph",
    "read_meta",
    "random_graph",
    "block_graph",
    "partition_graph",
]
