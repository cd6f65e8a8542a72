from occ_gnn_tpu.ops.blocks import Block, SampledBatch
from occ_gnn_tpu.ops.segment import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_softmax,
    spmm_sum,
    spmm_mean,
)

__all__ = [
    "Block",
    "SampledBatch",
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_softmax",
    "spmm_sum",
    "spmm_mean",
]
