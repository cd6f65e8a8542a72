"""HBM-budget cache auto-sizing (``--cache-per auto``).

The reference takes ``cache_pct`` as a user knob and never asks whether
the chip could simply hold more (/root/reference/python/utils/
memory_manager.py:40-72 — the 25% default rides through every
experiment; exp3's sweep shows epoch time falling monotonically with
cache size, /root/reference/experiments/exp3/exp3.txt:10-17). On TPU the
right default is to SIZE THE CACHE TO THE HBM: a v5e has 16 GB per chip,
and at ogbn-products scale the whole bf16 feature table (~627 MB) fits
with room to spare — at which point the per-batch refresh tail (87% of
the measured per-batch host->device payload in round 4) and the
per-worker tail feature gather (the largest single host-side cost)
both vanish.

Policy, given a free-HBM budget B and headroom h:

  usable_rows = floor(B * (1-h) / (feature_dim * dtype_bytes))
  * usable_rows >= max partition size  ->  no-refresh cache: every owned
    node is statically cached (CachePlan's ``cache_pct >= 1/P`` branch),
    and any remaining budget caches foreign high-degree extras, up to
    full replication (pct = 1.0) — extras turn cross-partition reads
    into local ones.
  * otherwise -> largest refreshing cache that fits:
    pct = (usable_rows - refresh_cap - 1) / N  (the +1 is the reserved
    dense-aggregation zero row).

Headroom covers what shares the chip with the frames: model+optimizer
state, the padded per-batch arena and activation working set, and XLA
scratch. The default 0.35 is deliberately conservative — at the bench's
products config the non-cache working set measures well under 2 GB, but
auto-sizing must never OOM a config it hasn't seen.
"""

from __future__ import annotations

import os

import numpy as np

from occ_gnn_tpu.data.graph import Graph

# Per-chip HBM when the backend can't report it (TPU v5e — the bench
# chip). Override with OCC_HBM_BYTES.
_DEFAULT_TPU_HBM = 16 * 1024**3


def hbm_budget_bytes(device=None) -> int:
    """Free bytes on the target device's memory space.

    Order: ``OCC_HBM_BYTES`` env override; the backend's
    ``memory_stats()`` (bytes_limit - bytes_in_use — live on real TPU);
    else the v5e default. The CPU backend (virtual-mesh tests) reports
    no stats and gets the TPU default too: CPU runs simulate a TPU, so
    sizing decisions should match the chip being simulated.
    """
    env = os.environ.get("OCC_HBM_BYTES")
    if env:
        return int(float(env))
    if device is None:
        import jax

        device = jax.local_devices()[0]
    try:
        ms = device.memory_stats()
    except Exception:
        ms = None
    if ms and ms.get("bytes_limit"):
        return int(ms["bytes_limit"]) - int(ms.get("bytes_in_use", 0))
    return _DEFAULT_TPU_HBM


def auto_cache_percentage(
    graph: Graph,
    partition_map: np.ndarray,
    num_partitions: int,
    dtype_bytes: int,
    refresh_cap: int,
    budget_bytes: int | None = None,
    headroom: float = 0.35,
) -> float:
    """Largest cache fraction whose per-chip frame fits the HBM budget.

    Returns a value directly usable as ``CachePlan.cache_percentage``:
    >= 1/P means no per-batch refresh (every owned node statically
    cached); 1.0 means full feature replication per chip. Returns 0.0
    when not even a minimal refreshing cache fits (caller should train
    uncached).
    """
    if budget_bytes is None:
        budget_bytes = hbm_budget_bytes()
    n = graph.num_nodes
    row_bytes = graph.feature_dim * dtype_bytes
    usable_rows = int(budget_bytes * (1.0 - headroom)) // max(row_bytes, 1)
    pmap = np.asarray(partition_map)
    max_own = int(np.bincount(pmap, minlength=num_partitions).max())
    if usable_rows >= max_own:
        # No-refresh regime. The frame holds max(own_p, pct*n) rows (+1
        # zero row); grow pct to spend the budget on foreign extras. The
        # max() with 1/P guards float rounding at the exact boundary —
        # CachePlan switches regimes on pct >= 1/P.
        pct = min(max(usable_rows - 1, max_own) / n, 1.0)
        return float(max(pct, 1.0 / num_partitions))
    pct = (usable_rows - refresh_cap - 1) / n
    return float(max(pct, 0.0))


def resolve_cache_percentage(
    spec: str | float,
    graph: Graph,
    partition_map: np.ndarray,
    num_partitions: int,
    dtype_bytes: int,
    refresh_cap: int,
    budget_bytes: int | None = None,
) -> float:
    """CLI-facing resolver: numeric strings pass through; ``auto`` sizes
    to the HBM budget."""
    if isinstance(spec, str) and spec.strip().lower() == "auto":
        pct = auto_cache_percentage(
            graph, partition_map, num_partitions, dtype_bytes,
            refresh_cap, budget_bytes=budget_bytes,
        )
        return pct
    return float(spec)
