"""Device-side innermost sampling (parallel/split.synthesize_device_innermost
+ the C++ service's device_innermost emission).

Correctness anchor: when every dst's in-degree <= fanout the host path
takes ALL neighbors in adjacency order (no random draws — csrc/
occ_sampler.cpp sample loop, `take == deg`), and the device synthesis
does the same — so host-built and device-synthesized layers must be
BIT-IDENTICAL, forward included. Sampled draws (deg > fanout) are
checked structurally: values come from the dst's adjacency row and the
mean denominator is min(deg, fanout) + 1.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occ_gnn_tpu.cache import CachePlan, SplitFeatureCache
from occ_gnn_tpu.data import partition_graph, random_graph
from occ_gnn_tpu.parallel.model import (
    SplitSAGE,
    make_device_csr,
    make_split_forward,
    make_split_train_step,
)
from occ_gnn_tpu.parallel.split import (
    SplitLayer,
    make_mesh,
    synthesize_device_innermost,
)
from occ_gnn_tpu.sampling.native import NativeSplitSampler

P = 4


def _max_fanout(g):
    return int(g.in_degrees().max())


@pytest.fixture(scope="module")
def setup(small_graph):
    g = small_graph
    pmap = partition_graph(g, P, mode="greedy")
    fanouts = [_max_fanout(g)] * 2  # deg <= fanout: no random draws
    return g, pmap, fanouts


def _samplers(g, pmap, fanouts, bs=32, seed=3):
    plan_h = CachePlan(g, pmap, P, 1.0, refresh_cap=8)
    plan_d = CachePlan(g, pmap, P, 1.0, refresh_cap=8)
    assert plan_h.replicated
    host = NativeSplitSampler(g, g.train_nodes(), pmap, P, fanouts, bs,
                              seed=seed, cache=plan_h, num_workers=1,
                              innermost="host")
    dev = NativeSplitSampler(g, g.train_nodes(), pmap, P, fanouts, bs,
                             seed=seed, cache=plan_d, num_workers=1,
                             innermost="device")
    return host, dev


def test_synthesized_layer_bit_identical_low_degree(setup):
    g, pmap, fanouts = setup
    host, dev = _samplers(g, pmap, fanouts)
    batch = g.train_nodes()[:32]
    bh = host.sample_batch(batch)
    bd = dev.sample_batch(batch)
    csr = make_device_csr(g)
    l0h = bh.layers[0]
    l0d = bd.layers[0]
    assert l0d.dst_global is not None and l0d.nbr_idx is None
    key = jax.random.PRNGKey(0)  # unused when deg <= fanout
    for p in range(P):
        lyr_p = SplitLayer(
            dst_global=l0d.dst_global[p], src_cap=l0d.src_cap,
            dst_cap=l0d.dst_cap, out_cap=l0d.out_cap, fanout=l0d.fanout,
        )
        syn = synthesize_device_innermost(lyr_p, csr[0], csr[1], key)
        kh = l0h.nbr_idx.shape[1]
        kd = syn.nbr_idx.shape[0]
        assert kd == kh
        # The device sampler shrinks dst_cap to the owned cap (no foreign
        # dst rows under replication); the host's extra columns must be
        # pure sentinel padding.
        D = syn.nbr_idx.shape[1]
        host_nbr = np.asarray(l0h.nbr_idx[p])
        assert (host_nbr[:, D:] == l0h.src_cap - 1).all()
        np.testing.assert_array_equal(np.asarray(syn.nbr_idx),
                                      host_nbr[:, :D])
        np.testing.assert_array_equal(np.asarray(syn.owned_idx),
                                      np.asarray(l0h.owned_idx[p]))
        np.testing.assert_array_equal(np.asarray(syn.owned_deg),
                                      np.asarray(l0h.owned_deg[p]))
        np.testing.assert_array_equal(np.asarray(syn.self_idx),
                                      np.asarray(l0h.self_idx[p]))
        np.testing.assert_array_equal(np.asarray(syn.owned_mask),
                                      np.asarray(l0h.owned_mask[p]))
        assert int(syn.num_owned) == int(l0h.num_owned[p])
    # outer layers identical by shared seed (RNG consumed in depth order;
    # the skipped innermost depth is sampled LAST on the host path)
    for lh, ld in zip(bh.layers[1:], bd.layers[1:]):
        np.testing.assert_array_equal(np.asarray(lh.nbr_idx),
                                      np.asarray(ld.nbr_idx))
    host.close()
    dev.close()


def test_forward_bit_identical_low_degree(setup):
    g, pmap, fanouts = setup
    host, dev = _samplers(g, pmap, fanouts, seed=5)
    batch = g.train_nodes()[:32]
    bh = host.sample_batch(batch)
    bd = dev.sample_batch(batch)
    mesh = make_mesh(P)
    model = SplitSAGE(g.feature_dim, 16, g.num_classes, 2)
    params = model.init(jax.random.PRNGKey(1))
    cache = SplitFeatureCache(host.cache_plan)
    fwd_h = make_split_forward(model, mesh)
    fwd_d = make_split_forward(model, mesh, csr=make_device_csr(g))
    lh = fwd_h(params, bh, cache.frames)
    ld = fwd_d(params, bd, cache.frames,
               sample_rng=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(lh), np.asarray(ld))
    host.close()
    dev.close()


def test_sampled_draws_structurally_valid(small_graph):
    """Fanout below max degree: draws must come from the dst's adjacency
    row and the mean denominator must be min(deg, fanout) + 1."""
    g = small_graph
    pmap = partition_graph(g, P, mode="greedy")
    fanouts = [3, 3]
    plan = CachePlan(g, pmap, P, 1.0, refresh_cap=8)
    dev = NativeSplitSampler(g, g.train_nodes(), pmap, P, fanouts, 32,
                             seed=11, cache=plan, num_workers=1,
                             innermost="device")
    b = dev.sample_batch(g.train_nodes()[:32])
    csr = make_device_csr(g)
    l0 = b.layers[0]
    indptr = np.asarray(g.indptr)
    indices = np.asarray(g.indices)
    deg = np.diff(indptr)
    zero_row = l0.src_cap - 1
    for p in range(P):
        lyr_p = SplitLayer(
            dst_global=l0.dst_global[p], src_cap=l0.src_cap,
            dst_cap=l0.dst_cap, out_cap=l0.out_cap, fanout=l0.fanout,
        )
        syn = synthesize_device_innermost(
            lyr_p, csr[0], csr[1], jax.random.PRNGKey(p)
        )
        dg = np.asarray(l0.dst_global[p])
        nbr = np.asarray(syn.nbr_idx)  # [K+1, D]
        odeg = np.asarray(syn.owned_deg)
        for d in range(dg.shape[0]):
            if dg[d] < 0:
                assert (nbr[:, d] == zero_row).all()
                continue
            v = dg[d]
            take = min(deg[v], fanouts[-1])
            assert nbr[0, d] == v  # self slot first
            adj = set(indices[indptr[v]:indptr[v + 1]])
            for k in range(1, nbr.shape[0]):
                if k <= take:
                    assert nbr[k, d] in adj
                else:
                    assert nbr[k, d] == zero_row
            if d < odeg.shape[0]:
                assert odeg[d] == take + 1
    dev.close()


def test_train_step_converges_device_innermost(community_graph):
    import optax

    g = community_graph
    pmap = partition_graph(g, P, mode="greedy")
    fanouts = [5, 5]
    plan = CachePlan(g, pmap, P, 1.0, refresh_cap=8)
    cache = SplitFeatureCache(plan)
    dev = NativeSplitSampler(g, g.train_nodes(), pmap, P, fanouts, 64,
                             seed=2, cache=cache, num_workers=1,
                             innermost="device")
    mesh = make_mesh(P)
    model = SplitSAGE(g.feature_dim, 32, g.num_classes, 2)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    step = make_split_train_step(model, opt, mesh, csr=make_device_csr(g))
    key = jax.random.PRNGKey(9)
    losses = []
    gstep = 0
    for _ in range(4):
        for batch in dev:
            params, opt_state, loss, c, t = step(
                params, opt_state, batch, cache.frames,
                sample_rng=jax.random.fold_in(key, gstep),
            )
            gstep += 1
            losses.append(float(loss))
    dev.close()
    assert losses[-1] < losses[0] * 0.5


def test_device_innermost_requires_replicated_cache(small_graph):
    g = small_graph
    pmap = partition_graph(g, P, mode="greedy")
    plan = CachePlan(g, pmap, P, 0.5, refresh_cap=8)
    with pytest.raises(ValueError, match="replicated"):
        NativeSplitSampler(g, g.train_nodes(), pmap, P, [5, 5], 32,
                           cache=plan, innermost="device")


def test_native_matches_numpy_replicated_cache(small_graph):
    """pct=1.0 identity frames: the C++ replicated shortcut must agree
    with the numpy slicer's cached_on/local_rows routing (all edges
    natural, zero shuffle)."""
    from occ_gnn_tpu.sampling.slicer import SplitSampler

    g = small_graph
    pmap = partition_graph(g, P, mode="greedy")
    fanouts = [_max_fanout(g)] * 2
    plan_py = CachePlan(g, pmap, P, 1.0, refresh_cap=8)
    plan_nat = CachePlan(g, pmap, P, 1.0, refresh_cap=8)
    py = SplitSampler(g, g.train_nodes(), pmap, P, fanouts, 32, seed=1,
                      cache=plan_py)
    nat = NativeSplitSampler(g, g.train_nodes(), pmap, P, fanouts, 32,
                             capacities=py.caps, seed=1, cache=plan_nat,
                             num_workers=1, emit_coo=True, emit_input=True)
    batch = g.train_nodes()[:32]
    b_py = py.sample_batch(batch)
    b_nat = nat.sample_batch(batch)
    for lp, ln in zip(b_py.layers, b_nat.layers):
        np.testing.assert_array_equal(np.asarray(lp.edge_src),
                                      np.asarray(ln.edge_src))
        np.testing.assert_array_equal(np.asarray(lp.edge_dst),
                                      np.asarray(ln.edge_dst))
        np.testing.assert_array_equal(np.asarray(lp.owned_deg),
                                      np.asarray(ln.owned_deg))
        np.testing.assert_array_equal(np.asarray(lp.self_idx),
                                      np.asarray(ln.self_idx))
    # replicated: every layer-0 edge is natural -> zero shuffle entries
    # (outer layers still shuffle: intermediate ACTIVATIONS are
    # partition-owned, only the input features are replicated)
    assert (np.asarray(b_nat.layers[0].push_idx) < 0).all()
    assert (np.asarray(b_py.layers[0].push_idx) < 0).all()
    nat.close()


def test_gat_forward_bit_identical_low_degree(setup):
    """The attention path consumes the synthesized nbr identically:
    device-innermost GAT forward == host-innermost GAT forward when
    deg <= fanout (no draws)."""
    from occ_gnn_tpu.parallel.model import SplitGAT

    g, pmap, fanouts = setup
    host, dev = _samplers(g, pmap, fanouts, seed=21)
    batch = g.train_nodes()[:32]
    bh = host.sample_batch(batch)
    bd = dev.sample_batch(batch)
    mesh = make_mesh(P)
    model = SplitGAT(g.feature_dim, 8, g.num_classes, 2, num_heads=2)
    params = model.init(jax.random.PRNGKey(2))
    cache = SplitFeatureCache(host.cache_plan)
    fwd_h = make_split_forward(model, mesh)
    fwd_d = make_split_forward(model, mesh, csr=make_device_csr(g))
    lh = fwd_h(params, bh, cache.frames)
    ld = fwd_d(params, bd, cache.frames, sample_rng=jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(lh), np.asarray(ld))
    host.close()
    dev.close()


import contextlib


@contextlib.contextmanager
def _sample_impl(name):
    from occ_gnn_tpu.ops.config import (
        device_sample_impl,
        set_device_sample_impl,
    )

    old = device_sample_impl()
    set_device_sample_impl(name)
    try:
        yield
    finally:
        set_device_sample_impl(old)


def test_window_layer_bit_identical_low_degree(setup):
    """OCC_DEVICE_SAMPLE=window, deg <= fanout: the contiguous slice at
    the doubled span's start IS the adjacency in order, so the window
    lowering keeps the host-path bit-identity contract."""
    g, pmap, fanouts = setup
    with _sample_impl("window"):
        host, dev = _samplers(g, pmap, fanouts, seed=13)
        batch = g.train_nodes()[:32]
        bh = host.sample_batch(batch)
        bd = dev.sample_batch(batch)
        csr = make_device_csr(g)  # doubled layout under window impl
        l0h, l0d = bh.layers[0], bd.layers[0]
        key = jax.random.PRNGKey(0)  # start unused when deg <= fanout
        for p in range(P):
            lyr_p = SplitLayer(
                dst_global=l0d.dst_global[p], src_cap=l0d.src_cap,
                dst_cap=l0d.dst_cap, out_cap=l0d.out_cap, fanout=l0d.fanout,
            )
            syn = synthesize_device_innermost(lyr_p, csr[0], csr[1], key)
            D = syn.nbr_idx.shape[1]
            host_nbr = np.asarray(l0h.nbr_idx[p])
            np.testing.assert_array_equal(np.asarray(syn.nbr_idx),
                                          host_nbr[:, :D])
            np.testing.assert_array_equal(np.asarray(syn.owned_deg),
                                          np.asarray(l0h.owned_deg[p]))
        host.close()
        dev.close()


def test_window_draws_uniform_marginals(small_graph):
    """deg > fanout under the window lowering: every draw comes from the
    dst's adjacency, a window never repeats a neighbor (without
    replacement when K <= deg), and per-neighbor selection frequency over
    many keys is the uniform K/deg."""
    g = small_graph
    K = 3
    indptr = np.asarray(g.indptr)
    indices = np.asarray(g.indices)
    deg = np.diff(indptr)
    # position-frequency accounting needs distinct neighbor values (a
    # multi-edge makes two positions indistinguishable by value)
    uniq = np.array([
        len(set(indices[indptr[v]:indptr[v + 1]].tolist())) == deg[v]
        for v in range(g.num_nodes)
    ])
    targets = np.flatnonzero((deg > K) & uniq)[:8]
    assert targets.size > 0, "fixture needs nodes with deg > fanout"
    with _sample_impl("window"):
        csr = make_device_csr(g)
        D = len(targets)
        lyr = SplitLayer(
            dst_global=jnp.asarray(targets, jnp.int32),
            src_cap=g.num_nodes + 1, dst_cap=D, out_cap=D, fanout=K,
        )
        counts = {int(v): np.zeros(deg[v], np.int64) for v in targets}
        trials = 400
        for t in range(trials):
            syn = synthesize_device_innermost(
                lyr, csr[0], csr[1], jax.random.PRNGKey(t)
            )
            nbr = np.asarray(syn.nbr_idx)  # [K+1, D]
            for d, v in enumerate(targets):
                adj = indices[indptr[v]:indptr[v + 1]]
                drawn = nbr[1:, d]
                assert len(set(drawn.tolist())) == K  # no repeats
                for u in drawn:
                    pos = np.flatnonzero(adj == u)
                    assert pos.size > 0  # from the adjacency
                    counts[int(v)][pos[0]] += 1
        for v in targets:
            freq = counts[int(v)] / trials
            expect = K / deg[v]
            # binomial CI: 400 trials, tolerate 5 sigma
            tol = 5 * np.sqrt(expect * (1 - expect) / trials)
            assert np.all(np.abs(freq - expect) < tol), (
                v, freq, expect, tol
            )


def test_window_forward_matches_host_low_degree(setup):
    """Full forward under the window lowering == host-innermost forward
    when deg <= fanout."""
    g, pmap, fanouts = setup
    with _sample_impl("window"):
        host, dev = _samplers(g, pmap, fanouts, seed=17)
        batch = g.train_nodes()[:32]
        bh = host.sample_batch(batch)
        bd = dev.sample_batch(batch)
        mesh = make_mesh(P)
        model = SplitSAGE(g.feature_dim, 16, g.num_classes, 2)
        params = model.init(jax.random.PRNGKey(1))
        cache = SplitFeatureCache(host.cache_plan)
        fwd_h = make_split_forward(model, mesh)
        fwd_d = make_split_forward(model, mesh, csr=make_device_csr(g))
        lh = fwd_h(params, bh, cache.frames)
        ld = fwd_d(params, bd, cache.frames,
                   sample_rng=jax.random.PRNGKey(7))
        np.testing.assert_array_equal(np.asarray(lh), np.asarray(ld))
        host.close()
        dev.close()


def test_device_mode_capacity_overflow_raises_in_turn(small_graph):
    """Error 3 (dst frame overflow) from the device-mode emission path
    surfaces as the same catchable 'overflow' ValueError the trainer's
    auto-replan matches on."""
    g = small_graph
    pmap = partition_graph(g, P, mode="greedy")
    plan = CachePlan(g, pmap, P, 1.0, refresh_cap=8)
    from occ_gnn_tpu.sampling.slicer import plan_split_capacities

    caps = plan_split_capacities(64, [5, 5], g.num_nodes, P)
    caps = dict(caps)
    caps["dst_caps"] = list(caps["dst_caps"])
    caps["out_caps"] = list(caps["out_caps"])
    caps["dst_caps"][0] = 4   # far below any real batch's dst fill
    caps["out_caps"][0] = 4
    dev = NativeSplitSampler(g, g.train_nodes(), pmap, P, [5, 5], 64,
                             capacities=caps, seed=1, cache=plan,
                             num_workers=1, innermost="device")
    with pytest.raises(ValueError, match="overflow"):
        dev.sample_batch(g.train_nodes()[:64])
    dev.close()


def test_csr_embed_policy_boundaries(small_graph, monkeypatch):
    """The embed-vs-argument policy: small CSRs embed as lowered
    constants, big ones ride as jit arguments; OCC_CSR_EMBED_MAX
    overrides. The default cap must keep the products-scale ~255 MB CSR
    embedded while pushing anything larger (e.g. the 500 MB window-mode
    doubled layout, which overflows compile-service request bodies) to
    the argument path."""
    from occ_gnn_tpu.parallel.model import _csr_embed, make_device_csr

    csr = make_device_csr(small_graph)
    assert _csr_embed(None) is False
    assert _csr_embed(csr) is True  # tiny graph: well under the cap
    monkeypatch.setenv("OCC_CSR_EMBED_MAX", "8")
    assert _csr_embed(csr) is False  # forced to the argument path
    monkeypatch.delenv("OCC_CSR_EMBED_MAX")
    # default cap sits between the measured-good 255 MB embed and the
    # measured-bad 500 MB one
    import os
    default_cap = 1 << 28
    assert 255e6 < default_cap < 500e6
    assert "OCC_CSR_EMBED_MAX" not in os.environ
