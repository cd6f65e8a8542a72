"""GraphSAGE over padded blocks (single-chip path).

Layer math matches the reference DistSageConv
(/root/reference/python/layers/dist_sageconv.py:42-84): per layer
``h_v = W @ concat(x_v, mean_{u in N(v) + self} x_u) + b``, ReLU + dropout
between layers (factory.py:28-42). The neighbor mean includes the
materialized self-loop edge, reproducing the reference sampler's
``self_loop_dests`` numerics (sampler.py:202-203).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from occ_gnn_tpu.models.common import dropout, linear, linear_init
from occ_gnn_tpu.ops.blocks import Block, SampledBatch
from occ_gnn_tpu.ops.segment import spmm_mean


class SAGEModel:
    def __init__(self, in_dim, hidden, num_classes, num_layers, dropout=0.0,
                 dtype=jnp.float32):
        self.in_dim = in_dim
        self.hidden = hidden
        self.num_classes = num_classes
        self.num_layers = num_layers
        self.dropout = dropout
        self.dtype = dtype

    def init(self, key) -> dict:
        dims = (
            [self.in_dim]
            + [self.hidden] * (self.num_layers - 1)
            + [self.num_classes]
        )
        keys = jax.random.split(key, self.num_layers)
        return {
            f"layer_{i}": linear_init(keys[i], 2 * dims[i], dims[i + 1])
            for i in range(self.num_layers)
        }

    def layer(self, params, block: Block, x: jax.Array) -> jax.Array:
        neigh = spmm_mean(x, block.edge_src, block.edge_dst, block.dst_cap)
        self_x = x[: block.dst_cap].astype(jnp.float32)
        return linear(params, jnp.concatenate([self_x, neigh], axis=-1))

    def apply(
        self,
        params: dict,
        batch: SampledBatch,
        x0: jax.Array,
        *,
        train: bool = False,
        rng: jax.Array | None = None,
    ) -> jax.Array:
        x = x0
        for i, block in enumerate(batch.blocks):
            x = self.layer(params[f"layer_{i}"], block, x)
            if i != len(batch.blocks) - 1:
                x = jax.nn.relu(x)
                if train and self.dropout > 0.0:
                    rng, sub = jax.random.split(rng)
                    x = dropout(sub, x, self.dropout, deterministic=False)
                x = x.astype(self.dtype)
        return x
