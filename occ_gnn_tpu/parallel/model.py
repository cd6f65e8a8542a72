"""Split-parallel models and the shard_map training step.

The reference's distributed model (DistSAGEModel/DistSageConv,
/root/reference/python/models/factory.py:28-42 +
python/layers/dist_sageconv.py:42-84) is a Python loop over 4 GPU-resident
DGL graphs with pairwise P2P pulls. Here the whole forward/backward/update
is ONE jit-compiled SPMD program over a device mesh: weights are replicated
(their gradients are psum'd by the shard_map transpose — the moral
equivalent of the reference's `torch.nn.parallel.replicate` + loss gather,
train.py:81-88), activations are partition-sharded, and each layer issues
one all_to_all over ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from occ_gnn_tpu.models.common import linear, linear_init
from occ_gnn_tpu.parallel.split import (
    SplitBatch,
    SplitLayer,
    local_aggregate,
    shuffle_merge,
    slice_owned,
)


def _unstack(tree):
    """Drop the leading unit axis shard_map leaves on P-sharded arrays."""
    return jax.tree_util.tree_map(lambda a: a[0], tree)


class SplitSAGE:
    """Split-parallel GraphSAGE: h_v = W.concat(x_v, mean_{N(v)+v} x_u) + b."""

    def __init__(self, in_dim, hidden, num_classes, num_layers, dropout=0.0):
        self.in_dim = in_dim
        self.hidden = hidden
        self.num_classes = num_classes
        self.num_layers = num_layers
        self.dropout = dropout

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

    def layer(self, params, lyr: SplitLayer, x: jax.Array) -> jax.Array:
        neigh = local_aggregate(x, lyr.edge_src, lyr.edge_dst, lyr.dst_cap)
        merged = shuffle_merge(neigh, lyr.push_idx, lyr.recv_idx)
        self_x, neigh_mean, mask = slice_owned(merged, lyr, x)
        h = linear(params, jnp.concatenate([self_x, neigh_mean], axis=-1))
        return h * mask

    def forward_local(self, params, layers, x):
        """Per-device forward (call inside shard_map; layers unstacked)."""
        for i, lyr in enumerate(layers):
            x = self.layer(params[f"layer_{i}"], lyr, x)
            if i != len(layers) - 1:
                x = jax.nn.relu(x)
        return x


class SplitGCN(SplitSAGE):
    """Split-parallel GCN: mean aggregation (self loop in edges) + linear."""

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

    def layer(self, params, lyr: SplitLayer, x: jax.Array) -> jax.Array:
        neigh = local_aggregate(x, lyr.edge_src, lyr.edge_dst, lyr.dst_cap)
        merged = shuffle_merge(neigh, lyr.push_idx, lyr.recv_idx)
        _, neigh_mean, mask = slice_owned(merged, lyr, x)
        return linear(params, neigh_mean) * mask


def _local_ce(logits, labels):
    """Per-device CE sum + counts (global mean taken after psum)."""
    valid = labels >= 0
    safe = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    nll = jnp.where(valid, nll, 0.0)
    pred = jnp.argmax(logits, axis=-1)
    correct = jnp.sum(jnp.where(valid, pred == labels, False))
    return jnp.sum(nll), jnp.sum(valid), correct


def make_split_forward(model, mesh):
    """jit'd sharded inference: returns per-partition logits [P, T_cap, C]."""

    def body(params, layers, x0):
        layers_l = [_unstack(l) for l in layers]
        logits = model.forward_local(params, layers_l, x0[0])
        return logits[None]

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P("p"), P("p")),
        out_specs=P("p"),
        check_vma=False,
    )

    @jax.jit
    def fwd(params, batch: SplitBatch, x0):
        return mapped(params, batch.layers, x0)

    return fwd


def make_split_train_step(model, optimizer, mesh):
    """jit'd sharded train step: forward, psum'd loss, backward (param grads
    psum'd by the shard_map transpose), optimizer update."""

    def loss_body(params, layers, labels, x0):
        layers_l = [_unstack(l) for l in layers]
        logits = model.forward_local(params, layers_l, x0[0])
        nll, cnt, correct = _local_ce(logits, labels[0])
        nll = jax.lax.psum(nll, "p")
        cnt = jax.lax.psum(cnt, "p")
        correct = jax.lax.psum(correct, "p")
        loss = nll / jnp.maximum(cnt, 1)
        return loss, (correct, cnt)

    mapped = jax.shard_map(
        loss_body,
        mesh=mesh,
        in_specs=(P(), P("p"), P("p"), P("p")),
        out_specs=(P(), (P(), P())),
        check_vma=False,
    )

    @jax.jit
    def step(params, opt_state, batch: SplitBatch, x0):
        (loss, (correct, cnt)), grads = jax.value_and_grad(
            lambda prm: mapped(prm, batch.layers, batch.labels, x0),
            has_aux=True,
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, correct, cnt

    return step
