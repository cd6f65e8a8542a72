from occ_gnn_tpu.parallel.split import SplitLayer, SplitBatch, make_mesh
from occ_gnn_tpu.parallel.model import (
    SplitSAGE,
    SplitGCN,
    SplitGAT,
    make_split_forward,
    make_split_train_step,
)
from occ_gnn_tpu.parallel.dp import make_dp_train_step, stack_batches
from occ_gnn_tpu.parallel.multihost import MultiHostSplitSampler

__all__ = [
    "SplitLayer",
    "SplitBatch",
    "make_mesh",
    "SplitSAGE",
    "SplitGCN",
    "SplitGAT",
    "make_split_forward",
    "make_split_train_step",
    "make_dp_train_step",
    "stack_batches",
    "MultiHostSplitSampler",
]
