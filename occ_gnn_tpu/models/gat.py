"""GAT over padded blocks: SDDMM attention scores + segment softmax.

The reference only scaffolds distributed GAT (dist_gatconv.py:3-6 raises
NotImplemented; bipartite.py:75-80 has the u_mul_v/sum ``attention_gather``
primitive and ref_gatconv.py is a DGL copy kept as numerics reference).
This implements the full GATConv: per head, e_uv = LeakyReLU(a_l.Wx_u +
a_r.Wx_v), alpha = softmax over in-edges of v, h_v = sum alpha * Wx_u.
Heads are concatenated on hidden layers and averaged on the output layer
(standard GAT; matches DGL GATConv semantics).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from occ_gnn_tpu.models.common import dropout, xavier_uniform
from occ_gnn_tpu.ops.blocks import Block, SampledBatch
from occ_gnn_tpu.ops.segment import segment_softmax, segment_sum


class GATModel:
    def __init__(
        self,
        in_dim,
        hidden,
        num_classes,
        num_layers,
        num_heads: int = 4,
        dropout: float = 0.0,
        negative_slope: float = 0.2,
    ):
        self.in_dim = in_dim
        self.hidden = hidden
        self.num_classes = num_classes
        self.num_layers = num_layers
        self.num_heads = num_heads
        self.dropout = dropout
        self.negative_slope = negative_slope

    def _dims(self):
        h, c, k = self.hidden, self.num_classes, self.num_heads
        ins = [self.in_dim] + [h * k] * (self.num_layers - 1)
        outs = [h] * (self.num_layers - 1) + [c]
        return ins, outs

    def init(self, key) -> dict:
        ins, outs = self._dims()
        params = {}
        for i in range(self.num_layers):
            key, wk, lk, rk = jax.random.split(key, 4)
            k, d_out = self.num_heads, outs[i]
            params[f"layer_{i}"] = {
                "w": xavier_uniform(wk, (ins[i], k * d_out)),
                "attn_l": xavier_uniform(lk, (k, d_out)),
                "attn_r": xavier_uniform(rk, (k, d_out)),
                "b": jnp.zeros((k * d_out,), jnp.float32),
            }
        return params

    def layer(self, p, block: Block, x: jax.Array, is_last: bool) -> jax.Array:
        k = self.num_heads
        d_out = p["attn_l"].shape[1]
        feat = (x @ p["w"]).reshape(-1, k, d_out)  # [S_cap, K, D]
        # Per-node attention halves (SDDMM decomposes: e_uv = el_u + er_v).
        el = jnp.einsum("skd,kd->sk", feat, p["attn_l"])  # [S_cap, K]
        er = jnp.einsum("skd,kd->sk", feat[: block.dst_cap], p["attn_r"])
        scores = el[block.edge_src] + er[jnp.minimum(block.edge_dst, block.dst_cap - 1)]
        scores = jax.nn.leaky_relu(scores, self.negative_slope)
        alpha = segment_softmax(scores, block.edge_dst, block.dst_cap)  # [E, K]
        msgs = feat[block.edge_src] * alpha[:, :, None]  # [E, K, D]
        out = segment_sum(msgs, block.edge_dst, block.dst_cap)  # [V, K, D]
        if is_last:
            return out.mean(axis=1)
        return out.reshape(-1, k * d_out) + p["b"]

    def apply(self, params, batch: SampledBatch, x0, *, train=False, rng=None):
        x = x0
        n = len(batch.blocks)
        for i, block in enumerate(batch.blocks):
            x = self.layer(params[f"layer_{i}"], block, x, is_last=(i == n - 1))
            if i != n - 1:
                x = jax.nn.elu(x)
                if train and self.dropout > 0.0:
                    rng, sub = jax.random.split(rng)
                    x = dropout(sub, x, self.dropout, deterministic=False)
        return x
