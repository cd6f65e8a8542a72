"""Op-backend configuration.

``use_pallas()`` selects the Pallas TPU kernels for the hot ops (sorted
segment-sum SpMM) instead of the XLA scatter path. Opt in via
``OCC_USE_PALLAS=1`` or ``set_use_pallas(True)``. Off by default: the XLA
path is the reference numerics and works on every backend; flip it on
per-deployment after validating speed on the target chip generation.
"""

from __future__ import annotations

import os

_use_pallas: bool | None = None


def use_pallas() -> bool:
    global _use_pallas
    if _use_pallas is None:
        _use_pallas = os.environ.get("OCC_USE_PALLAS", "0") == "1"
    return _use_pallas


def set_use_pallas(value: bool) -> None:
    global _use_pallas
    _use_pallas = bool(value)


_dense_agg: str | None = None
_DENSE_AGG_CHOICES = ("unrolled", "tiled")


def dense_agg_impl() -> str:
    """Dense fanout-K aggregation lowering: 'unrolled' (one gather per k,
    XLA materializes each) or 'tiled' (lax.scan over dst tiles keeping the
    per-tile gather+accumulate chain in VMEM).

    Read at TRACE time — the choice is baked into each jit cache entry, so
    call ``set_dense_agg_impl`` (or set ``OCC_DENSE_AGG``) before the step
    function first compiles; changing it afterwards has no effect on
    already-compiled programs (same semantics as ``use_pallas``)."""
    global _dense_agg
    if _dense_agg is None:
        v = os.environ.get("OCC_DENSE_AGG", "unrolled")
        if v not in _DENSE_AGG_CHOICES:
            raise ValueError(
                f"OCC_DENSE_AGG={v!r} is not one of {_DENSE_AGG_CHOICES}"
            )
        _dense_agg = v
    return _dense_agg


def set_dense_agg_impl(value: str) -> None:
    global _dense_agg
    if value not in _DENSE_AGG_CHOICES:
        raise ValueError(f"dense_agg impl must be one of {_DENSE_AGG_CHOICES}")
    _dense_agg = value


_gat_attention: str | None = None
_GAT_ATTENTION_CHOICES = ("batched", "online", "tiled")


def gat_attention_impl() -> str:
    """Dense fanout-K GAT attention lowering: 'batched' (one [K_cap, D_cap]
    leaf gather + exact two-pass softmax over the K axis, leaf-space
    weighted aggregation, single per-head projection of the partial sums),
    'online' (flash-style one-k-at-a-time streaming softmax with
    jax.checkpoint; O(D*H) residents but K full carry read/writes), or
    'tiled' (lax.scan over dst tiles of OCC_GAT_TILE rows: per tile one
    [K, T, H] leaf gather, exact two-pass softmax, and per-k
    project-then-weight MXU matmuls with a tile-sized f32 accumulator —
    bounds every intermediate to the tile, trading the batched form's
    full-frame [D, heads, H] HBM streams for per-tile working sets).

    Read at TRACE time, same semantics as ``dense_agg_impl``."""
    global _gat_attention
    if _gat_attention is None:
        v = os.environ.get("OCC_GAT_ATTENTION", "batched")
        if v not in _GAT_ATTENTION_CHOICES:
            raise ValueError(
                f"OCC_GAT_ATTENTION={v!r} is not one of "
                f"{_GAT_ATTENTION_CHOICES}"
            )
        _gat_attention = v
    return _gat_attention


def set_gat_attention_impl(value: str) -> None:
    global _gat_attention
    if value not in _GAT_ATTENTION_CHOICES:
        raise ValueError(
            f"gat_attention impl must be one of {_GAT_ATTENTION_CHOICES}"
        )
    _gat_attention = value


_gat_agg: str | None = None
_GAT_AGG_CHOICES = ("fma", "einsum")


def gat_agg_impl() -> str:
    """Lowering of the batched GAT weighted partial sum
    agg[d,c,:] = sum_k pw[k,d,c] * xg[k,d,:]: 'einsum' (default —
    dot_general with batch dim D and a K-length contraction) or 'fma'
    (unrolled K-loop of broadcast multiply-adds).

    MEASURED at products scale on v5e (r4, bench_tpu.jsonl): einsum
    83.5 ms/step vs fma 100.2 ms. The fma form streams the [D, heads,
    H_in] f32 accumulator through HBM on every one of the K_cap=26
    unrolled adds (~2x258 MB per add), swamping its VPU-fusion benefit;
    the einsum contracts K on-chip. (The r3 ablation's 17.2 ms
    "einsum cost over a plain-sum floor" compared uniform-weight einsum
    against an UNWEIGHTED sum — it never measured fma, which is why the
    r3 default flip was wrong; reverted here with both forms measured.)

    Read at TRACE time, same semantics as ``dense_agg_impl``."""
    global _gat_agg
    if _gat_agg is None:
        v = os.environ.get("OCC_GAT_AGG", "einsum")
        if v not in _GAT_AGG_CHOICES:
            raise ValueError(
                f"OCC_GAT_AGG={v!r} is not one of {_GAT_AGG_CHOICES}"
            )
        _gat_agg = v
    return _gat_agg


def set_gat_agg_impl(value: str) -> None:
    global _gat_agg
    if value not in _GAT_AGG_CHOICES:
        raise ValueError(f"gat_agg impl must be one of {_GAT_AGG_CHOICES}")
    _gat_agg = value


_gat_remat: str | None = None
_GAT_REMAT_CHOICES = ("none", "dots")


def gat_remat_impl() -> str:
    """Rematerialization policy for the split-GAT layer backward: 'none'
    (XLA stores every residual the vjp reads) or 'dots' (jax.checkpoint
    with ``dots_with_no_batch_dims_saveable``: matmul/einsum outputs are
    saved, the elementwise score chain — leaky_relu, masking, exp — is
    recomputed in the backward, trading VPU flops for residual HBM
    streams). The r5 FULL-recompute attempt (nothing_saveable) measured
    +59.4 ms — re-gathering leaves costs far more than reading
    residuals; this selective point keeps the gathers/dots saved.

    MEASURED (r5, products scale on v5e, bench_tpu.jsonl): none
    93.3 ms/step, dots 118.6 — the recomputed chain re-streams its
    einsum inputs from HBM, costing more than the residual reads it
    avoids. Both remat points are now refuted with numbers; the GAT
    backward's ~14.2 ms residual/param-gradient remainder is a
    measured floor, not an un-attempted optimization. 'none' stays the
    default.

    Read at TRACE time, same semantics as ``dense_agg_impl``."""
    global _gat_remat
    if _gat_remat is None:
        v = os.environ.get("OCC_GAT_REMAT", "none")
        if v not in _GAT_REMAT_CHOICES:
            raise ValueError(
                f"OCC_GAT_REMAT={v!r} is not one of {_GAT_REMAT_CHOICES}"
            )
        _gat_remat = v
    return _gat_remat


def set_gat_remat_impl(value: str) -> None:
    global _gat_remat
    if value not in _GAT_REMAT_CHOICES:
        raise ValueError(
            f"gat_remat impl must be one of {_GAT_REMAT_CHOICES}"
        )
    _gat_remat = value


_device_sample: str | None = None
_DEVICE_SAMPLE_CHOICES = ("randint", "bitsf32", "bitsf32_dk", "window")


def device_sample_impl() -> str:
    """Device-innermost draw + CSR gather lowering
    (parallel/split.synthesize_device_innermost): 'randint'
    (jax.random.randint with per-dst maxval — integer remainder is
    emulated on the TPU VPU), 'bitsf32' (random bits -> f32 multiply ->
    floor; no integer division, exact for deg < 2^24 with a min guard),
    'bitsf32_dk' (same draws, but the CSR element gather runs d-major
    so one dst's K draws — which sit in a ~100-byte adjacency span —
    share cache lines, transposed back afterwards), or 'window' (ONE
    uniform start per dst + a contiguous K-slice gather from a
    DOUBLED-adjacency CSR: per-dst transactions drop from K scattered
    4-byte reads to one 4K-byte slice, and RNG draws from K*D to D.
    deg <= fanout stays bit-identical to the host path — the slice at
    the span start IS the adjacency in order; deg > fanout becomes
    wrap-around window sampling: uniform per-neighbor marginals,
    without replacement, but adjacency-contiguous draws are correlated
    within one dst's sample — a different, equally valid sampler than
    rand%deg-with-replacement. Costs 2x CSR memory
    (make_device_csr builds the doubled layout when this is selected).

    MEASURED (r5, products scale on v5e, bench_tpu.jsonl): randint
    64.0 ms/step, window 150.5 ms — the vmapped per-dst dynamic_slice
    lowers FAR worse than K*D scattered element gathers, the third
    measured refutation (after 'bitsf32_dk' 108.5 and the r4 d-major
    feature gather) of the hypothesis that the step is
    gather-transaction/locality bound. 'randint' stays the default;
    'window' is kept as the comparison point and for graphs where the
    2x-CSR/correlated-draw trade is wanted for other reasons.

    Read at TRACE time, same semantics as ``dense_agg_impl``."""
    global _device_sample
    if _device_sample is None:
        v = os.environ.get("OCC_DEVICE_SAMPLE", "randint")
        if v not in _DEVICE_SAMPLE_CHOICES:
            raise ValueError(
                f"OCC_DEVICE_SAMPLE={v!r} is not one of "
                f"{_DEVICE_SAMPLE_CHOICES}"
            )
        _device_sample = v
    return _device_sample


def set_device_sample_impl(value: str) -> None:
    global _device_sample
    if value not in _DEVICE_SAMPLE_CHOICES:
        raise ValueError(
            f"device_sample impl must be one of {_DEVICE_SAMPLE_CHOICES}"
        )
    _device_sample = value
