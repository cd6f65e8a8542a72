"""Neighbor sampler invariants (reference pattern: conservation asserts in
sampler.py:91,125-133 + test_sampler at sampler.py:227-249)."""

import numpy as np

from occ_gnn_tpu.sampling.neighbor import (
    NeighborSampler,
    dedup_first_occurrence,
    plan_capacities,
    sample_layer_edges,
)


def test_dedup_first_occurrence():
    prefix = np.array([5, 2, 9], dtype=np.int64)
    extra = np.array([2, 7, 5, 7, 1], dtype=np.int64)
    frame, uniq, rank = dedup_first_occurrence(prefix, extra)
    np.testing.assert_array_equal(frame, [5, 2, 9, 7, 1])
    local = rank[np.searchsorted(uniq, extra)]
    np.testing.assert_array_equal(frame[local], extra)


def test_sample_layer_edges_structure(small_graph):
    rng = np.random.default_rng(0)
    frontier = np.unique(rng.integers(0, small_graph.num_nodes, 64))
    fanout = 5
    e_dst, e_src = sample_layer_edges(small_graph, frontier, fanout, rng)
    n = frontier.shape[0]
    # dst-major order with the self loop leading each group.
    assert (np.diff(e_dst) >= 0).all()
    deg = small_graph.in_degrees()[frontier]
    expect = np.minimum(deg, fanout) + 1
    counts = np.bincount(e_dst, minlength=n)
    np.testing.assert_array_equal(counts, expect)
    starts = np.cumsum(counts) - counts
    np.testing.assert_array_equal(e_src[starts], frontier)
    # Every sampled src is a real in-neighbor of its dst.
    g = small_graph
    for i in rng.choice(e_dst.shape[0], 50):
        v = frontier[e_dst[i]]
        u = e_src[i]
        nbrs = g.indices[g.indptr[v] : g.indptr[v + 1]]
        assert u == v or u in nbrs


def test_sampled_batch_shapes_and_labels(small_graph):
    fanouts = [4, 3]
    bs = 32
    sampler = NeighborSampler(small_graph, small_graph.train_nodes(),
                              fanouts, bs, seed=0)
    batch = next(iter(sampler))
    caps = sampler.caps
    assert len(batch.blocks) == 2
    for l, blk in enumerate(batch.blocks):
        assert blk.src_cap == caps["frame_caps"][l]
        assert blk.dst_cap == caps["frame_caps"][l + 1]
        assert blk.edge_src.shape[0] == caps["edge_caps"][l]
        ne = int(blk.num_edges)
        dst = np.asarray(blk.edge_dst)
        assert (dst[:ne] < int(blk.num_dst)).all()
        assert (dst[ne:] == blk.dst_cap).all()  # padding sentinel
        assert (np.asarray(blk.edge_src)[:ne] < int(blk.num_src)).all()
        # sorted by dst
        assert (np.diff(dst) >= 0).all()
    # dst-first chaining: block l's dst count == block l+1's src count.
    assert int(batch.blocks[0].num_dst) == int(batch.blocks[1].num_src)
    # labels match the target nodes
    labels = np.asarray(batch.labels)
    n_t = int(batch.blocks[-1].num_dst)
    in_nodes = np.asarray(batch.input_nodes)
    n_in = int(batch.blocks[0].num_src)
    assert (in_nodes[:n_in] >= 0).all()
    assert (in_nodes[n_in:] == -1).all()
    assert (labels[:n_t] >= 0).all()
    assert (labels[n_t:] == -1).all()


def test_epoch_covers_all_train_nodes(small_graph):
    sampler = NeighborSampler(small_graph, small_graph.train_nodes(),
                              [3], 64, seed=1)
    seen = 0
    for batch in sampler:
        seen += int(batch.blocks[-1].num_dst)
    assert seen == small_graph.train_nodes().shape[0]
    assert len(sampler) == -(-small_graph.train_nodes().shape[0] // 64)


def test_frame_chain_consistency(small_graph):
    """The dst frame of layer l must be the first rows of layer l+1's src
    frame (dst-first ordering) — checked via global ids."""
    fanouts = [4, 4]
    sampler = NeighborSampler(small_graph, small_graph.train_nodes(),
                              fanouts, 16, seed=2)
    g = small_graph
    # Recompute frames by hand through a private re-run with same seed.
    batch = sampler.sample_batch(small_graph.train_nodes()[:16])
    b0, b1 = batch.blocks
    in_nodes = np.asarray(batch.input_nodes)
    n0 = int(b0.num_src)
    # Self-loop edges sit somewhere in the COO: for each valid dst row d of
    # block 0, there must exist an edge (src=d_row_in_frame, dst=d) whose
    # src frame global id equals the dst's global id. With dst-first
    # ordering the dst node's own row in the src frame is row d.
    ne = int(b0.num_edges)
    es = np.asarray(b0.edge_src)[:ne]
    ed = np.asarray(b0.edge_dst)[:ne]
    self_edges = es == ed
    n_dst0 = int(b0.num_dst)
    assert np.unique(ed[self_edges]).shape[0] == n_dst0


def test_full_neighborhood_fanout(small_graph):
    """fanout=-1 takes the complete in-neighborhood (reference fanout=-1)."""
    from occ_gnn_tpu.sampling.neighbor import sample_layer_edges

    rng = np.random.default_rng(5)
    frontier = np.unique(rng.integers(0, small_graph.num_nodes, 50))
    e_dst, e_src = sample_layer_edges(small_graph, frontier, -1, rng)
    deg = small_graph.in_degrees()[frontier]
    counts = np.bincount(e_dst, minlength=frontier.shape[0])
    np.testing.assert_array_equal(counts, deg + 1)


def test_full_neighborhood_native_parity(small_graph):
    """fanout=-1 is deterministic -> native == numpy bit-exact."""
    from occ_gnn_tpu.data import partition_graph
    from occ_gnn_tpu.sampling.native import NativeSplitSampler
    from occ_gnn_tpu.sampling.slicer import SplitSampler

    g = small_graph
    pmap = partition_graph(g, 4, mode="greedy")
    py = SplitSampler(g, g.train_nodes(), pmap, 4, [-1, -1], 16, seed=1)
    nat = NativeSplitSampler(g, g.train_nodes(), pmap, 4, [-1, -1], 16,
                             capacities=py.caps, seed=1, num_workers=1)
    nodes = g.train_nodes()[:16]
    a, b = py.sample_batch(nodes), nat.sample_batch(nodes)
    for la, lb in zip(a.layers, b.layers):
        np.testing.assert_array_equal(np.asarray(la.edge_src),
                                      np.asarray(lb.edge_src))
        np.testing.assert_array_equal(np.asarray(la.edge_dst),
                                      np.asarray(lb.edge_dst))
    nat.close()


def _simple_graph(src_graph):
    """Deduplicate parallel edges (the random generator is a multigraph;
    without-replacement draws are distinct CSR slots, which only maps to
    distinct neighbors on a simple graph)."""
    from occ_gnn_tpu.data.graph import from_edge_list

    g = src_graph
    dst = np.repeat(np.arange(g.num_nodes), g.in_degrees())
    pairs = np.unique(np.stack([g.indices, dst]), axis=1)
    return from_edge_list(pairs[0], pairs[1], g.num_nodes, g.features,
                          g.labels, g.num_classes)


def test_without_replacement_sampling(small_graph):
    """replace=False draws distinct neighbors (DGL semantics)."""
    from occ_gnn_tpu.sampling.neighbor import sample_layer_edges

    g = _simple_graph(small_graph)
    rng = np.random.default_rng(7)
    deg = g.in_degrees()
    frontier = np.nonzero(deg > 4)[0][:40]
    fanout = 3
    e_dst, e_src = sample_layer_edges(g, frontier, fanout, rng,
                                      replace=False)
    counts = np.bincount(e_dst, minlength=frontier.shape[0])
    np.testing.assert_array_equal(counts, np.minimum(deg[frontier], fanout) + 1)
    for i in range(frontier.shape[0]):
        srcs = e_src[e_dst == i][1:]  # skip self loop
        assert np.unique(srcs).shape[0] == srcs.shape[0], "duplicate draw"


def test_native_without_replacement(small_graph):
    """C++ replace=False: per-dst sampled neighbors are distinct."""
    from occ_gnn_tpu.data import partition_graph
    from occ_gnn_tpu.sampling.native import NativeSplitSampler

    g = _simple_graph(small_graph)
    pmap = partition_graph(g, 1, mode="round_robin", attach=False)
    s = NativeSplitSampler(g, np.arange(g.num_nodes), pmap, 1, [3], 64,
                           seed=5, num_workers=1, replace=False,
                           emit_coo=True)
    b = s.sample_batch(np.arange(64))
    lyr = b.layers[0]
    es = np.asarray(lyr.edge_src)[0]
    ed = np.asarray(lyr.edge_dst)[0]
    valid = ed < lyr.dst_cap
    es, ed = es[valid], ed[valid]
    for d in np.unique(ed):
        srcs = es[ed == d]
        assert np.unique(srcs).shape[0] == srcs.shape[0]
    s.close()


def test_fast_capacity_probe_matches_padded(small_graph):
    """The fast (counting-only) capacity prober must return EXACTLY the
    capacities of the padded-slicing prober — same RNG stream, same
    maxima — with and without a cache plan."""
    from occ_gnn_tpu.cache import CachePlan
    from occ_gnn_tpu.data import partition_graph
    from occ_gnn_tpu.sampling.slicer import (
        measure_split_capacities,
        plan_split_capacities,
    )

    g = small_graph
    pmap = partition_graph(g, 4, mode="greedy", attach=False)
    fanouts = [4, 3]
    slow = measure_split_capacities(g, g.train_nodes(), pmap, 4, fanouts,
                                    48, num_batches=3, seed=5, fast=False)
    fastc = measure_split_capacities(g, g.train_nodes(), pmap, 4, fanouts,
                                     48, num_batches=3, seed=5, fast=True)
    assert slow == fastc, (slow, fastc)

    safe = plan_split_capacities(48, fanouts, g.num_nodes, 4)
    plan_a = CachePlan(g, pmap, 4, 0.1, refresh_cap=safe["frame_caps"][0])
    plan_b = CachePlan(g, pmap, 4, 0.1, refresh_cap=safe["frame_caps"][0])
    slow = measure_split_capacities(g, g.train_nodes(), pmap, 4, fanouts,
                                    48, num_batches=3, seed=5,
                                    cache_plan=plan_a, fast=False)
    fastc = measure_split_capacities(g, g.train_nodes(), pmap, 4, fanouts,
                                     48, num_batches=3, seed=5,
                                     cache_plan=plan_b, fast=True)
    assert slow == fastc, (slow, fastc)
