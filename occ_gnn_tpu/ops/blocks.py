"""Static-shaped padded bipartite blocks — the device-side graph format.

TPU-first re-design of the reference's per-layer graph objects
(/root/reference/python/data/bipartite.py:20-99 wraps ragged DGL
heterographs; /root/reference/cslicer/bipartite.h:7-84 builds append-only
CSR). XLA wants static shapes, so a sampled layer is a fixed-capacity,
padding-tolerant COO:

  * ``edge_src[E_cap]``  — local row in the layer's *source frame* (the
    deduplicated frontier; dst nodes occupy rows ``[0, num_dst)`` of the
    frame, newly discovered nodes follow — "dst-first" ordering, so the
    dst frame of layer L IS the src frame of layer L+1 and no reindexing
    op is needed between layers).
  * ``edge_dst[E_cap]``  — local dst row in ``[0, num_dst)``; padding
    edges carry the sentinel ``dst_cap``, which segment ops drop as
    out-of-range. Edges are sorted by ``edge_dst`` so segment reductions
    can use ``indices_are_sorted=True`` and the Pallas kernels can walk
    runs.
  * self-loop edges are materialized in the COO (the reference appends
    self loops during sampling, sampler.py:202-203), so a mean over the
    edge list equals DGL mean-with-self-loop numerics.

All capacities are shapes; all "how full" counts are dynamic i32 scalars.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Block:
    """One sampled layer as a padded COO bipartite graph.

    ``src_cap`` / ``dst_cap`` are static (pytree metadata): they are shape
    information and part of the compiled step's signature.
    """

    edge_src: jax.Array  # i32[E_cap]
    edge_dst: jax.Array  # i32[E_cap], sorted, padding == dst_cap
    num_src: jax.Array   # i32[] valid rows in src frame
    num_dst: jax.Array   # i32[] valid rows in dst frame
    num_edges: jax.Array  # i32[] valid edges
    src_cap: int = dataclasses.field(metadata=dict(static=True), default=0)
    dst_cap: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def edge_cap(self) -> int:
        return self.edge_src.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SampledBatch:
    """A full sampled minibatch for the single-chip path.

    ``blocks`` are ordered innermost-first (model consumption order): the
    src frame of ``blocks[0]`` is the deepest frontier, whose global node
    ids are ``input_nodes``; the dst frame of ``blocks[-1]`` are the batch
    target nodes, labeled by ``labels`` (padding label == -1 is masked out
    of the loss).
    """

    blocks: list[Block]
    input_nodes: jax.Array  # i32[F0_cap] global ids, padding == -1
    labels: jax.Array       # i32[T_cap], padding == -1

    @property
    def num_layers(self) -> int:
        return len(self.blocks)


def pad_to(a: np.ndarray, cap: int, fill) -> np.ndarray:
    """Host-side: pad 1-D array to capacity with fill; truncation is an error."""
    if a.shape[0] > cap:
        raise ValueError(
            f"capacity overflow: need {a.shape[0]}, cap {cap} — raise the "
            f"capacity config (static shapes are chosen up front on TPU)"
        )
    out = np.full((cap,), fill, dtype=a.dtype)
    out[: a.shape[0]] = a
    return out


def block_from_numpy(
    edge_src: np.ndarray,
    edge_dst: np.ndarray,
    num_src: int,
    num_dst: int,
    edge_cap: int,
    dst_cap: int,
    src_cap: int,
) -> Block:
    """Pack host COO (already deduplicated/localized) into a padded Block."""
    order = np.argsort(edge_dst, kind="stable")
    edge_src = edge_src[order].astype(np.int32)
    edge_dst = edge_dst[order].astype(np.int32)
    return Block(
        edge_src=jnp.asarray(pad_to(edge_src, edge_cap, 0)),
        edge_dst=jnp.asarray(pad_to(edge_dst, edge_cap, dst_cap)),
        num_src=jnp.int32(num_src),
        num_dst=jnp.int32(num_dst),
        num_edges=jnp.int32(edge_src.shape[0]),
        src_cap=src_cap,
        dst_cap=dst_cap,
    )
