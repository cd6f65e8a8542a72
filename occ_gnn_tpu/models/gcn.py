"""GCN over padded blocks: aggregation (with self loop) + linear.

The reference's GCN prototype (src/models/model1.hh:60-100: SageAggr ->
Linear -> ReLU -> SageAggr -> Linear) aggregates with a plain MEAN and then
projects; ``norm='mean'`` (the default) reproduces that. ``norm='sym'``
is the textbook Kipf–Welling symmetric normalization
(1/sqrt(d_u d_v), block-local degrees) for users who expect GCN to mean
the normalized variant.
"""

from __future__ import annotations

import jax

from occ_gnn_tpu.models.common import dropout, linear, linear_init
from occ_gnn_tpu.ops.blocks import Block, SampledBatch
from occ_gnn_tpu.ops.segment import spmm_mean, spmm_sym


class GCNModel:
    def __init__(self, in_dim, hidden, num_classes, num_layers, dropout=0.0,
                 norm: str = "mean"):
        if norm not in ("mean", "sym"):
            raise ValueError(f"norm must be 'mean' or 'sym', got {norm!r}")
        self.in_dim = in_dim
        self.hidden = hidden
        self.num_classes = num_classes
        self.num_layers = num_layers
        self.dropout = dropout
        self.norm = norm

    def init(self, key) -> dict:
        dims = (
            [self.in_dim]
            + [self.hidden] * (self.num_layers - 1)
            + [self.num_classes]
        )
        keys = jax.random.split(key, self.num_layers)
        return {
            f"layer_{i}": linear_init(keys[i], dims[i], dims[i + 1])
            for i in range(self.num_layers)
        }

    def layer(self, params, block: Block, x: jax.Array) -> jax.Array:
        if self.norm == "sym":
            neigh = spmm_sym(x, block.edge_src, block.edge_dst,
                             block.dst_cap, block.src_cap)
        else:
            neigh = spmm_mean(x, block.edge_src, block.edge_dst,
                              block.dst_cap)
        return linear(params, neigh)

    def apply(self, params, batch: SampledBatch, x0, *, train=False, rng=None):
        x = x0
        for i, block in enumerate(batch.blocks):
            x = self.layer(params[f"layer_{i}"], block, x)
            if i != len(batch.blocks) - 1:
                x = jax.nn.relu(x)
                if train and self.dropout > 0.0:
                    rng, sub = jax.random.split(rng)
                    x = dropout(sub, x, self.dropout, deterministic=False)
        return x
