"""Statistical correctness of the SUBSAMPLED regime (fanout < degree).

Round-1 parity tests only covered the deterministic take-all case
(fanout >= max degree); these tests exercise the random draw paths:

  * numpy with-replacement (``rand % deg`` — reference
    /root/reference/cslicer/slicer.cpp:6-22 semantics),
  * numpy without-replacement (DGL sample_neighbors semantics),
  * C++ with-replacement (XorShift ``rand % deg``),
  * C++ without-replacement via Floyd's algorithm (fanout <= 64) AND via
    reservoir sampling (fanout > 64 — previously a silent with-replacement
    fallback, now removed).

Each neighbor of a hub node must be drawn uniformly: chi-square frequency
test over many independent batches, plus an exact-distinctness check for
the without-replacement paths.
"""

import numpy as np
import pytest

from occ_gnn_tpu.data.graph import Graph


def _hub_graph(D: int) -> Graph:
    """Node 0 has in-neighbors 1..D; nodes 1..D have no in-neighbors."""
    n = D + 1
    indptr = np.zeros(n + 1, dtype=np.int64)
    indptr[1:] = D  # node 0 owns all edges
    indices = np.arange(1, D + 1, dtype=np.int64)
    feats = np.zeros((n, 4), np.float32)
    labels = np.zeros(n, np.int32)
    return Graph(indptr=indptr, indices=indices, features=feats,
                 labels=labels, num_classes=2)


def _chi2_uniform(counts: np.ndarray, alpha_bound: float = 2.0):
    """Pearson chi-square statistic vs the uniform expectation; asserts the
    statistic is within ``alpha_bound`` standard deviations of the chi2
    mean (df large -> normal approx; alpha_bound=2 with a fixed seed is
    deterministic, the bound just documents the scale)."""
    total = counts.sum()
    k = counts.shape[0]
    expected = total / k
    stat = float(((counts - expected) ** 2 / expected).sum())
    df = k - 1
    # chi2 mean df, sd sqrt(2 df)
    assert stat < df + alpha_bound * np.sqrt(2 * df) + 1e-9, (
        f"chi2 stat {stat:.1f} vs df {df} (counts not uniform)"
    )
    return stat


# ---------------------------------------------------------------------------
# numpy paths
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("replace", [True, False])
def test_numpy_subsample_uniform(replace):
    from occ_gnn_tpu.sampling.neighbor import sample_layer_edges

    D, fanout, trials = 40, 8, 800
    g = _hub_graph(D)
    rng = np.random.default_rng(123)
    counts = np.zeros(D + 1, dtype=np.int64)
    frontier = np.array([0], dtype=np.int64)
    for _ in range(trials):
        e_dst, e_src = sample_layer_edges(g, frontier, fanout, rng,
                                          replace=replace)
        nbrs = e_src[e_src != 0]  # drop the self loop
        assert nbrs.shape[0] == fanout
        if not replace:
            assert np.unique(nbrs).shape[0] == fanout, \
                "without-replacement draw repeated a neighbor"
        counts[nbrs] += 1
    _chi2_uniform(counts[1:])


def test_numpy_without_replacement_multi_dst():
    """The vectorized per-segment draw stays distinct and uniform when
    several large-degree dst nodes are sampled in one call."""
    from occ_gnn_tpu.sampling.neighbor import sample_layer_edges

    # 3 hubs, each with the same D in-neighbors (shared neighbor pool)
    D, fanout, trials = 30, 6, 400
    hubs = 3
    n = hubs + D
    indptr = np.zeros(n + 1, dtype=np.int64)
    indptr[1 : hubs + 1] = np.arange(1, hubs + 1) * D
    indptr[hubs + 1 :] = hubs * D
    indices = np.tile(np.arange(hubs, hubs + D, dtype=np.int64), hubs)
    g = Graph(indptr=indptr, indices=indices,
              features=np.zeros((n, 4), np.float32),
              labels=np.zeros(n, np.int32), num_classes=2)
    rng = np.random.default_rng(7)
    frontier = np.arange(hubs, dtype=np.int64)
    counts = np.zeros(n, dtype=np.int64)
    for _ in range(trials):
        e_dst, e_src = sample_layer_edges(g, frontier, fanout, rng,
                                          replace=False)
        for h in range(hubs):
            nbrs = e_src[(e_dst == h) & (e_src != frontier[h])]
            assert nbrs.shape[0] == fanout
            assert np.unique(nbrs).shape[0] == fanout
            counts[nbrs] += 1
    _chi2_uniform(counts[hubs:])


# ---------------------------------------------------------------------------
# C++ service paths
# ---------------------------------------------------------------------------


def _native_neighbor_counts(D, fanout, trials, replace, seed=11):
    """Sample the hub node repeatedly through the C++ service; count which
    global neighbors appear in the deepest input frame."""
    from occ_gnn_tpu.sampling.native import NativeSplitSampler

    from occ_gnn_tpu.sampling.slicer import (
        default_deg_caps,
        plan_split_capacities,
    )

    g = _hub_graph(D)
    pmap = np.zeros(g.num_nodes, dtype=np.int32)
    caps = plan_split_capacities(1, [fanout], g.num_nodes, 1)
    # generous budgets: frame must also hold the reserved dense zero row
    caps = {k: ([x + fanout + 8 for x in v] if k != "deg_caps" else v)
            for k, v in caps.items()}
    caps["deg_caps"] = default_deg_caps([fanout])
    sampler = NativeSplitSampler(
        g, np.array([0], dtype=np.int64), pmap, 1, [fanout], 1,
        capacities=caps, seed=seed, num_workers=1, replace=replace,
    )
    counts = np.zeros(D + 1, dtype=np.int64)
    per_batch_distinct = []
    try:
        for _ in range(trials):
            batch = sampler.sample_batch(np.array([0], dtype=np.int64))
            inp = np.asarray(batch.input_nodes).reshape(-1)
            nbrs = inp[(inp > 0)]  # global ids; 0 is the hub, -1 pad
            per_batch_distinct.append(nbrs.shape[0])
            counts[nbrs] += 1
    finally:
        sampler.close()
    return counts, np.array(per_batch_distinct)


def test_native_with_replacement_uniform():
    D, fanout, trials = 40, 8, 800
    counts, distinct = _native_neighbor_counts(D, fanout, trials, True)
    # with replacement the frame dedups, so distinct <= fanout
    assert (distinct <= fanout).all() and (distinct >= 1).all()
    _chi2_uniform(counts[1:])


def test_native_floyd_without_replacement_uniform():
    D, fanout, trials = 40, 8, 800
    counts, distinct = _native_neighbor_counts(D, fanout, trials, False)
    # every draw distinct -> frame always holds exactly fanout neighbors
    assert (distinct == fanout).all(), \
        "Floyd's draw repeated a neighbor (distinct < fanout)"
    _chi2_uniform(counts[1:])


def test_native_reservoir_fanout_over_64():
    """fanout > 64 without replacement: reservoir sampling must yield
    exactly ``fanout`` DISTINCT neighbors (the round-1 silent
    with-replacement fallback yields fewer after frame dedup with
    probability ~1) and remain uniform."""
    D, fanout, trials = 200, 96, 300
    counts, distinct = _native_neighbor_counts(D, fanout, trials, False)
    assert (distinct == fanout).all(), \
        "reservoir draw repeated a neighbor (distinct < fanout)"
    _chi2_uniform(counts[1:])
