"""Pallas TPU kernel: segment-sum over dst-sorted edges via MXU one-hots.

The hot op of every GNN layer is ``out[d] = sum_{e: dst[e]=d} msgs[e]``.
XLA lowers this to a scatter-add; on TPU scatters are memory-transaction
bound. Because the slicer emits edges SORTED BY LOCAL DST (see
sampling/slicer.py), each output tile's edges form a contiguous range, and
the reduction within a tile can be expressed as dense matmuls with
on-the-fly one-hot matrices:

    for dst tile t (rows [t*TD, t*TD+TD)):
        for each chunk of C edges in the tile's contiguous edge range:
            onehot[c, r] = (rel[c] == r)               # [C, TD] compare
            acc += onehot^T @ msgs_chunk               # [TD, H] on the MXU

2*TD*H flops per edge ride the systolic array instead of scatter
transactions; the edge stream is read sequentially from HBM with
double-buffered DMA. This is the role of the reference's CUDA ``SageAggr``
kernel (src/gnn/sage.cu:7-78, one thread per feature) — redesigned for
the MXU.

Layout trick: the per-edge tile-relative dst id rides as ONE EXTRA f32
COLUMN of the message stream (ids < TILE_D are exact in f32), so the
kernel reads a single well-shaped [C, H+1] f32 stream — no narrow int32
VMEM buffers. Per-tile edge ranges come from one device-side
``searchsorted``. Chunk rows past the tile's edge range are masked by
edge index (their rel ids would alias into this tile). Backward
(d msgs = cotangent gathered by dst) is a sorted XLA gather.

STATUS: numerically validated in interpret mode (tests/test_pallas_spmm.py)
and lowers cleanly for TPU via AOT (``.lower(lowering_platforms=('tpu',))``).
On the current bench harness the remote Mosaic compile service hangs for
any kernel combining an in-loop DMA with vector arithmetic (bisected down
to that combination — DMA-only loops and compute-only loops both compile
in <1s); gated off by default (ops/config.py) until it can be validated on
a directly-attached TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_D = 256      # output rows per grid step
CHUNK_E = 512     # edges folded per MXU matmul


def _kernel(offsets_ref, aug_hbm, out_ref, acc_ref, buf, sems):
    t = pl.program_id(0)
    p0 = offsets_ref[t]
    p1 = offsets_ref[t + 1]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    num_chunks = pl.cdiv(p1 - p0, CHUNK_E)
    H1 = buf.shape[-1]

    def dma(chunk_idx):
        return pltpu.make_async_copy(
            aug_hbm.at[pl.ds(p0 + chunk_idx * CHUNK_E, CHUNK_E), :],
            buf,
            sems,
        )

    @pl.when(num_chunks > 0)
    def _():

        def body(i, _):
            d = dma(i)
            d.start()
            d.wait()
            chunk = buf[:]                             # [C, H+1]
            # rel ids ride as an f32 column; Mosaic iota must be integer.
            rel = chunk[:, H1 - 1 :].astype(jnp.int32)  # [C, 1]
            # Mask rows past p1 (chunk overrun into the next tile, whose
            # rel ids would alias into this tile's rows).
            start = p0 + i * CHUNK_E
            in_range = (
                jax.lax.broadcasted_iota(jnp.int32, (CHUNK_E, 1), 0)
                + start
            ) < p1
            onehot = jnp.logical_and(
                rel
                == jax.lax.broadcasted_iota(
                    jnp.int32, (CHUNK_E, TILE_D), 1
                ),
                in_range,
            ).astype(jnp.float32)                      # [C, TD]
            acc_ref[:] += jax.lax.dot_general(
                onehot, chunk[:, : H1 - 1],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return 0

        jax.lax.fori_loop(0, num_chunks, body, 0)

    out_ref[:] = acc_ref[:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def segment_sum_sorted(msgs: jax.Array, edge_dst: jax.Array,
                       num_segments: int) -> jax.Array:
    """Pallas segment-sum for dst-sorted COO. msgs [E, H] f32, edge_dst [E]
    i32 sorted (padding == num_segments). Returns [num_segments, H]."""
    return _forward(msgs, edge_dst, num_segments)


def _forward(msgs, edge_dst, num_segments):
    E, H = msgs.shape
    D_pad = pl.cdiv(num_segments, TILE_D) * TILE_D
    num_tiles = D_pad // TILE_D
    bounds = jnp.arange(0, D_pad + 1, TILE_D, dtype=jnp.int32)
    offsets = jnp.searchsorted(edge_dst, bounds, side="left").astype(
        jnp.int32
    )
    # Tile-relative dst id as an extra f32 column; padding edges get an
    # id outside [0, TILE_D) so their one-hot row is all-false.
    rel = jnp.where(
        edge_dst < num_segments, edge_dst % TILE_D, TILE_D
    ).astype(jnp.float32)
    aug = jnp.concatenate([msgs, rel[:, None]], axis=1)
    aug = jnp.concatenate(
        [aug, jnp.full((CHUNK_E, H + 1), TILE_D, aug.dtype)], axis=0
    )  # overrun pad

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (TILE_D, H), lambda t, offsets: (t, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE_D, H), jnp.float32),
            pltpu.VMEM((CHUNK_E, H + 1), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((D_pad, H), jnp.float32),
    )(offsets, aug)
    return out[:num_segments]


def _fwd(msgs, edge_dst, num_segments):
    return _forward(msgs, edge_dst, num_segments), edge_dst


def _bwd(num_segments, edge_dst, g):
    # d msgs[e] = g[dst[e]] — a sorted gather; padding rows read a zero pad.
    g_pad = jnp.concatenate(
        [g, jnp.zeros((1, g.shape[1]), g.dtype)], axis=0
    )
    idx = jnp.minimum(edge_dst, num_segments)
    return (g_pad[idx], None)


segment_sum_sorted.defvjp(_fwd, _bwd)


def spmm_sum_pallas(x, edge_src, edge_dst, num_dst):
    """Gather (XLA) + Pallas sorted segment-sum."""
    return segment_sum_sorted(x[edge_src], edge_dst, num_dst)


def spmm_mean_pallas(x, edge_src, edge_dst, num_dst):
    total = spmm_sum_pallas(x, edge_src, edge_dst, num_dst)
    ones = jnp.ones(edge_dst.shape[:1] + (1,), x.dtype)
    count = segment_sum_sorted(ones, edge_dst, num_dst)
    return total / jnp.maximum(count, 1.0)
