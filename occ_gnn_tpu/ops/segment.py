"""Segment reductions and sparse message-passing ops (XLA path).

These are the TPU equivalents of the reference's aggregation kernels:
``spmm_mean`` replaces DGL ``update_all(copy_u, mean)``
(/root/reference/python/data/bipartite.py:61-67) and the hand-written CUDA
``SageAggr`` kernel (/root/reference/src/gnn/sage.cu:7-78); ``segment_softmax``
+ ``spmm_sum`` of (score * value) replace ``attention_gather``
(/root/reference/python/data/bipartite.py:75-80).

Padding convention: out-of-range segment ids (``== num_segments``) are
dropped — XLA scatter in FILL_OR_DROP mode — so padded edges need no masks.
Backward passes are XLA gathers (transpose of scatter-add), which XLA
handles natively; the Pallas variant lives in
occ_gnn_tpu.ops.pallas_spmm_blocked and is selected via
``occ_gnn_tpu.ops.config``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    indices_are_sorted: bool = True,
) -> jax.Array:
    return jax.ops.segment_sum(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_max(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    indices_are_sorted: bool = True,
) -> jax.Array:
    return jax.ops.segment_max(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    indices_are_sorted: bool = True,
) -> jax.Array:
    total = segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    ones = jnp.ones(segment_ids.shape[:1], dtype=data.dtype)
    count = segment_sum(ones, segment_ids, num_segments, indices_are_sorted)
    count = jnp.maximum(count, 1.0)
    return total / count.reshape((num_segments,) + (1,) * (data.ndim - 1))


def segment_softmax(
    scores: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    indices_are_sorted: bool = True,
) -> jax.Array:
    """Numerically-stable softmax within each segment (GAT attention).

    ``scores`` is [E] or [E, heads]; rows whose segment id is out of range
    (padding) come back as 0 (their exp contributes to no segment and the
    gathered max for them is a finite dummy).
    """
    smax = segment_max(scores, segment_ids, num_segments, indices_are_sorted)
    # Empty segments have -inf max; replace to keep arithmetic finite.
    smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
    safe_ids = jnp.minimum(segment_ids, num_segments - 1)
    shifted = scores - smax[safe_ids]
    expv = jnp.exp(shifted)
    # Zero padded rows so they don't pollute gathered denominators.
    valid = (segment_ids < num_segments).reshape(
        (-1,) + (1,) * (scores.ndim - 1)
    )
    expv = jnp.where(valid, expv, 0.0)
    denom = segment_sum(expv, segment_ids, num_segments, indices_are_sorted)
    denom = jnp.maximum(denom, 1e-16)
    return expv / denom[safe_ids]


def spmm_sum(
    x_src: jax.Array,
    edge_src: jax.Array,
    edge_dst: jax.Array,
    num_dst: int,
    edge_weight: jax.Array | None = None,
) -> jax.Array:
    """sum_{(u -> v) in E} w_uv * x[u]  per dst v. [E]-indexed COO, sorted."""
    msgs = x_src[edge_src]
    if edge_weight is not None:
        msgs = msgs * edge_weight.reshape((-1,) + (1,) * (msgs.ndim - 1))
    from occ_gnn_tpu.ops.config import use_pallas

    if use_pallas() and msgs.ndim == 2:
        from occ_gnn_tpu.ops.pallas_spmm_blocked import segment_sum_sorted

        return segment_sum_sorted(msgs, edge_dst, num_dst)
    return segment_sum(msgs, edge_dst, num_dst)


def spmm_sym(
    x_src: jax.Array,
    edge_src: jax.Array,
    edge_dst: jax.Array,
    num_dst: int,
    num_src: int,
) -> jax.Array:
    """Kipf–Welling symmetric normalization over the sampled block:
    out[v] = sum_{(u->v)} x[u] / sqrt(d_out(u) * d_in(v)), degrees counted
    within the block (self-loop edges included by the sampler). The
    reference's GCN prototype uses plain mean aggregation
    (src/models/model1.hh:60-100); this is the textbook-GCN variant for
    users who expect ``norm='sym'`` semantics."""
    valid = (edge_dst < num_dst).astype(jnp.float32)
    deg_in = segment_sum(valid, edge_dst, num_dst)
    deg_out = segment_sum(valid, edge_src, num_src, indices_are_sorted=False)
    safe_dst = jnp.minimum(edge_dst, num_dst - 1)
    coeff = valid * jax.lax.rsqrt(
        jnp.maximum(deg_out[edge_src], 1.0) * jnp.maximum(deg_in[safe_dst], 1.0)
    )
    return spmm_sum(
        x_src.astype(jnp.float32), edge_src, edge_dst, num_dst,
        edge_weight=coeff,
    )


def spmm_mean(
    x_src: jax.Array,
    edge_src: jax.Array,
    edge_dst: jax.Array,
    num_dst: int,
) -> jax.Array:
    """DGL fn.mean numerics: mean over valid in-edges; zero-degree rows -> 0.

    Accumulation is f32 regardless of input dtype (bf16 storage reads half
    the bytes; the upcast fuses into the gather)."""
    total = spmm_sum(x_src.astype(jnp.float32), edge_src, edge_dst, num_dst)
    ones = jnp.ones(edge_dst.shape[:1], dtype=jnp.float32)
    count = segment_sum(ones, edge_dst, num_dst)
    return total / jnp.maximum(count, 1.0)[:, None]
