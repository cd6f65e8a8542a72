"""HBM-budget cache auto-sizing (cache/autosize.py).

The reference pins cache_pct as a user knob (memory_manager.py:40-72);
auto-sizing is the TPU-first replacement: fit the largest cache the
chip's free HBM allows, eliminating the per-batch refresh tail whenever
every owned node fits statically."""

import numpy as np
import pytest

from occ_gnn_tpu.cache import CachePlan, auto_cache_percentage, resolve_cache_percentage
from occ_gnn_tpu.data import partition_graph

P = 4


def _budget_for_rows(g, rows, dtype_bytes, headroom=0.35):
    """Budget whose usable share holds exactly ``rows`` frame rows."""
    return int(np.ceil(rows * g.feature_dim * dtype_bytes / (1 - headroom)))


def test_full_table_fits_gives_full_replication(small_graph):
    g = small_graph
    pmap = partition_graph(g, P, mode="greedy")
    pct = auto_cache_percentage(
        g, pmap, P, dtype_bytes=2, refresh_cap=64,
        budget_bytes=16 * 1024**3,
    )
    assert pct == 1.0
    plan = CachePlan(g, pmap, P, pct, refresh_cap=64)
    assert not plan.needs_refresh
    assert plan.refresh_cap == 0
    # full replication: every partition statically caches every node
    for p in range(P):
        assert plan.static_nodes[p].shape[0] == g.num_nodes


def test_partial_budget_no_refresh_regime(small_graph):
    g = small_graph
    pmap = partition_graph(g, P, mode="greedy")
    max_own = int(np.bincount(pmap, minlength=P).max())
    # Budget for ~half the table: enough for every owned node (no
    # refresh) plus foreign extras, but short of full replication.
    rows = g.num_nodes // 2
    assert rows > max_own
    pct = auto_cache_percentage(
        g, pmap, P, dtype_bytes=4, refresh_cap=64,
        budget_bytes=_budget_for_rows(g, rows, 4),
    )
    assert 1.0 / P <= pct < 1.0
    plan = CachePlan(g, pmap, P, pct, refresh_cap=64)
    assert not plan.needs_refresh
    # the frame respects the row budget (+1 reserved zero row)
    assert plan.frame_cap <= rows + 1


def test_tight_budget_falls_back_to_refreshing_cache(small_graph):
    g = small_graph
    pmap = partition_graph(g, P, mode="greedy")
    max_own = int(np.bincount(pmap, minlength=P).max())
    rows = max_own // 2  # cannot hold every owned node
    refresh_cap = 32
    pct = auto_cache_percentage(
        g, pmap, P, dtype_bytes=4, refresh_cap=refresh_cap,
        budget_bytes=_budget_for_rows(g, rows, 4),
    )
    assert 0.0 < pct < 1.0 / P
    plan = CachePlan(g, pmap, P, pct, refresh_cap=refresh_cap)
    assert plan.needs_refresh
    assert plan.frame_cap <= rows + 1


def test_no_budget_returns_zero(small_graph):
    g = small_graph
    pmap = partition_graph(g, P, mode="greedy")
    pct = auto_cache_percentage(
        g, pmap, P, dtype_bytes=4, refresh_cap=64, budget_bytes=1024,
    )
    assert pct == 0.0


def test_exact_boundary_stays_no_refresh(small_graph):
    """pct at the 1/P float boundary must land in CachePlan's no-refresh
    branch (the regime switch is pct >= 1/P)."""
    g = small_graph
    pmap = (np.arange(g.num_nodes) % P).astype(np.int32)  # balanced
    max_own = int(np.bincount(pmap, minlength=P).max())
    pct = auto_cache_percentage(
        g, pmap, P, dtype_bytes=4, refresh_cap=64,
        budget_bytes=_budget_for_rows(g, max_own, 4),
    )
    plan = CachePlan(g, pmap, P, pct, refresh_cap=64)
    assert not plan.needs_refresh


def test_resolver_passthrough_and_auto(small_graph):
    g = small_graph
    pmap = partition_graph(g, P, mode="greedy")
    assert resolve_cache_percentage("0.25", g, pmap, P, 4, 8) == 0.25
    assert resolve_cache_percentage(0.1, g, pmap, P, 4, 8) == 0.1
    auto = resolve_cache_percentage(
        "auto", g, pmap, P, 4, 8, budget_bytes=16 * 1024**3
    )
    assert auto == 1.0


def test_env_override(monkeypatch, small_graph):
    from occ_gnn_tpu.cache.autosize import hbm_budget_bytes

    monkeypatch.setenv("OCC_HBM_BYTES", "123456789")
    assert hbm_budget_bytes() == 123456789
