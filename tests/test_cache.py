"""Feature cache semantics (reference MemoryManager / PaCache) + parity of
the cache-aware split path with the plain path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occ_gnn_tpu.cache import CachePlan, SingleChipCache, SplitFeatureCache
from occ_gnn_tpu.data import partition_graph
from occ_gnn_tpu.models import SAGEModel
from occ_gnn_tpu.parallel.model import SplitSAGE, make_split_forward
from occ_gnn_tpu.parallel.split import make_mesh
from occ_gnn_tpu.sampling.slicer import SplitSampler, raw_to_single_batch
from occ_gnn_tpu.training import gather_features

P = 4


def test_cache_plan_static_selection_small(small_graph):
    g = small_graph
    pmap = partition_graph(g, P, mode="greedy")
    plan = CachePlan(g, pmap, P, cache_percentage=0.1, refresh_cap=256)
    assert plan.needs_refresh
    deg = g.out_degrees()
    for p in range(P):
        cached = plan.static_nodes[p]
        assert cached.shape[0] == plan.static_size
        # all cached nodes belong to partition p (<=1/P case)
        assert (pmap[cached] == p).all()
        # they are the highest-degree nodes of the partition
        own = np.nonzero(pmap == p)[0]
        thresh = np.sort(deg[own])[::-1][plan.static_size - 1]
        assert deg[cached].min() >= thresh


def test_cache_plan_large_includes_whole_partition(small_graph):
    g = small_graph
    pmap = partition_graph(g, P, mode="greedy")
    plan = CachePlan(g, pmap, P, cache_percentage=0.5, refresh_cap=8)
    assert not plan.needs_refresh
    for p in range(P):
        own = np.nonzero(pmap == p)[0]
        assert np.isin(own, plan.static_nodes[p]).all()
        # foreign extras are cached too, up to static_size
        assert plan.static_nodes[p].shape[0] == plan.static_size


def test_cache_refresh_evicts_and_fills(small_graph):
    g = small_graph
    pmap = partition_graph(g, P, mode="greedy")
    plan = CachePlan(g, pmap, P, cache_percentage=0.05, refresh_cap=256)
    rng = np.random.default_rng(0)
    batch1 = rng.choice(g.num_nodes, 200, replace=False)
    tail1 = plan.refresh(batch1)
    # every batch node is now present on its owner
    owners = pmap[batch1]
    assert (plan.local_rows(batch1, owners) >= 0).all()
    # staged tail rows carry the right features
    for p in range(P):
        miss = plan._dynamic[p]
        if miss.size:
            np.testing.assert_allclose(
                tail1[p, : miss.shape[0]], g.features[miss]
            )
    dyn1 = [d.copy() for d in plan._dynamic]
    batch2 = rng.choice(g.num_nodes, 200, replace=False)
    plan.refresh(batch2)
    # previous dynamic fill was evicted unless re-added for batch2
    for p in range(P):
        gone = np.setdiff1d(dyn1[p], plan._dynamic[p])
        assert (plan.local_rows(gone, p) == -1).all()
        assert not plan.cached_on(gone, p).any()


def test_refresh_overflow_raises(small_graph):
    g = small_graph
    pmap = partition_graph(g, P, mode="greedy")
    plan = CachePlan(g, pmap, P, cache_percentage=0.01, refresh_cap=4)
    with pytest.raises(ValueError, match="refresh overflow"):
        plan.refresh(np.arange(g.num_nodes))


@pytest.mark.parametrize("cache_pct", [0.08, 0.5])
def test_cached_split_forward_matches_plain(small_graph, cache_pct):
    """Cache-aware slicing changes WHERE edges execute, not the math: the
    forward must match the no-cache split path and the single-chip path."""
    g = small_graph
    pmap = partition_graph(g, P, mode="greedy")
    mesh = make_mesh(P)

    plain = SplitSampler(g, g.train_nodes(), pmap, P, [4, 3], 32, seed=5)
    plan = CachePlan(g, pmap, P, cache_percentage=cache_pct,
                     refresh_cap=plain.caps["frame_caps"][0])
    cache = SplitFeatureCache(plan)
    cached = SplitSampler(g, g.train_nodes(), pmap, P, [4, 3], 32, seed=5,
                          cache=cache)

    batch_nodes = g.train_nodes()[:32]
    raw = plain._sample_raw(batch_nodes)
    plain_batch = plain.slice_raw(raw)
    cached_batch = cached.slice_raw(raw)
    single_batch = raw_to_single_batch(raw, g, plain.caps)

    model_s = SAGEModel(g.feature_dim, 8, g.num_classes, 2)
    model_d = SplitSAGE(g.feature_dim, 8, g.num_classes, 2)
    params = model_s.init(jax.random.PRNGKey(0))

    x_single = gather_features(g.features, single_batch.input_nodes)
    logits_single = np.asarray(model_s.apply(params, single_batch, x_single))

    fwd = make_split_forward(model_d, mesh)
    xs_plain = jnp.stack([
        gather_features(g.features, plain_batch.input_nodes[p])
        for p in range(P)
    ])
    logits_plain = np.asarray(fwd(params, plain_batch, xs_plain))
    logits_cached = np.asarray(fwd(params, cached_batch, cache.frames))

    targets = raw[0].frontier
    for p in range(P):
        n = (pmap[targets] == p).sum()
        rows = np.nonzero(pmap[targets] == p)[0]
        np.testing.assert_allclose(
            logits_cached[p, :n], logits_single[rows], rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            logits_cached[p, :n], logits_plain[p, :n], rtol=1e-4, atol=1e-4
        )


def test_cache_reduces_shuffle_volume(small_graph):
    """With >=1/P cache the innermost layer's natural edges run on the dst
    owner — shuffle volume must not exceed the no-cache slicing's."""
    g = small_graph
    pmap = partition_graph(g, P, mode="greedy")
    plain = SplitSampler(g, g.train_nodes(), pmap, P, [4, 3], 32, seed=6)
    plan = CachePlan(g, pmap, P, cache_percentage=0.5, refresh_cap=8)
    cached = SplitSampler(g, g.train_nodes(), pmap, P, [4, 3], 32, seed=6,
                          cache=SplitFeatureCache(plan))
    raw = plain._sample_raw(g.train_nodes()[:32])
    b_plain = plain.slice_raw(raw)
    b_cached = cached.slice_raw(raw)

    def shuffle_count(lyr):
        return int((np.asarray(lyr.push_idx) >= 0).sum())

    assert shuffle_count(b_cached.layers[0]) <= shuffle_count(
        b_plain.layers[0]
    )


def test_single_chip_cache_hit_rate_and_assembly(small_graph):
    g = small_graph
    from occ_gnn_tpu.sampling.neighbor import NeighborSampler

    sampler = NeighborSampler(g, g.train_nodes(), [4, 3], 32, seed=0)
    cache = SingleChipCache(g, 0.3, sampler.caps["frame_caps"][0])
    batch = next(iter(sampler))
    x0 = np.asarray(cache.load_input_frame(np.asarray(batch.input_nodes)))
    golden = np.asarray(gather_features(g.features, batch.input_nodes))
    np.testing.assert_allclose(x0, golden, rtol=1e-6, atol=1e-6)
    assert 0.0 < cache.hit_rate <= 1.0
    # High-degree nodes are cached, so hit rate should beat the cache pct.
    assert cache.hit_rate > 0.3


def test_compact_maps_match_dense_reference(small_graph):
    """The compact maps (owner_local + per-partition foreign arrays) answer
    cached_on/local_rows exactly like a brute-force dense [N, P]
    reconstruction from static_nodes, in BOTH cache regimes (<= 1/P: owner
    only; > 1/P: foreign high-degree extras)."""
    g = small_graph
    pmap = partition_graph(g, P, mode="greedy")
    for pct in (0.05, 0.5):
        plan = CachePlan(g, pmap, P, cache_percentage=pct, refresh_cap=64)
        n = g.num_nodes
        dense_mask = np.zeros((n, P), bool)
        dense_g2l = np.full((n, P), -1, np.int64)
        for p in range(P):
            rows = plan.static_nodes[p]
            dense_mask[rows, p] = True
            dense_g2l[rows, p] = np.arange(rows.shape[0])
        rng = np.random.default_rng(0)
        nodes = rng.integers(0, n, 5000)
        parts = rng.integers(0, P, 5000)
        np.testing.assert_array_equal(
            plan.cached_on(nodes, parts), dense_mask[nodes, parts]
        )
        np.testing.assert_array_equal(
            plan.local_rows(nodes, parts), dense_g2l[nodes, parts]
        )


def test_cache_plan_memory_is_O_N_not_O_NP(small_graph):
    """papers100M viability: no [N, P] host map exists; per-node state is
    one int32 row (owner_local) plus wmap."""
    g = small_graph
    pmap = partition_graph(g, P, mode="greedy")
    plan = CachePlan(g, pmap, P, cache_percentage=0.1, refresh_cap=32)
    assert not hasattr(plan, "node_mask")
    assert not hasattr(plan, "global_to_local")
    assert plan.owner_local.dtype == np.int32
    assert plan.owner_local.shape == (g.num_nodes,)
    assert plan.static_owner_local.nbytes == 4 * g.num_nodes
