"""Split-parallelism correctness: slicer invariants, and the headline
guarantee — split-parallel forward/backward over a 4-device mesh equals the
single-chip path allclose (the reference could only eyeball this; we built
both paths off identical raw samples so it is exact)."""

import numpy as np
import pytest
import torch  # noqa: F401  (keeps torch import order consistent)

import jax
import jax.numpy as jnp
import optax

from occ_gnn_tpu.data import partition_graph
from occ_gnn_tpu.models import SAGEModel
from occ_gnn_tpu.models.common import masked_cross_entropy
from occ_gnn_tpu.parallel.model import (
    SplitGCN,
    SplitSAGE,
    make_split_forward,
    make_split_train_step,
)
from occ_gnn_tpu.parallel.split import make_mesh
from occ_gnn_tpu.sampling.slicer import SplitSampler, raw_to_single_batch
from occ_gnn_tpu.training import gather_features

P = 4


@pytest.fixture(scope="module")
def sliced(small_graph):
    g = small_graph
    pmap = partition_graph(g, P, mode="greedy")
    sampler = SplitSampler(g, g.train_nodes(), pmap, P, [4, 3], 32, seed=7)
    batch_nodes = g.train_nodes()[:32]
    raw = sampler._sample_raw(batch_nodes)
    split_batch = sampler.slice_raw(raw)
    single_batch = raw_to_single_batch(raw, g, sampler.caps)
    return g, pmap, sampler, raw, split_batch, single_batch


def test_slicer_edge_conservation(sliced):
    """Total valid edges across partitions == total sampled edges per layer
    (reference assert at sampler.py:125-133)."""
    g, pmap, sampler, raw, split_batch, _ = sliced
    L = len(raw)
    for l, lyr in enumerate(split_batch.layers):
        rl = raw[L - 1 - l]
        dst = np.asarray(lyr.edge_dst)
        valid = (dst < lyr.dst_cap).sum()
        assert valid == rl.e_dst.shape[0]


def test_slicer_owned_coverage(sliced):
    """Every frontier node appears as an owned node on exactly its owner."""
    g, pmap, sampler, raw, split_batch, _ = sliced
    L = len(raw)
    for l, lyr in enumerate(split_batch.layers):
        rl = raw[L - 1 - l]
        total_owned = int(np.asarray(lyr.num_owned).sum())
        assert total_owned == rl.frontier.shape[0]
        for p in range(P):
            n = int(np.asarray(lyr.num_owned)[p])
            own_global = rl.frontier[pmap[rl.frontier] == p]
            assert n == own_global.shape[0]


def test_slicer_push_recv_pairing(sliced):
    """push_idx on p and recv_idx on q reference the same global nodes in
    the same order, and recv targets land in q's owned prefix."""
    g, pmap, sampler, raw, split_batch, _ = sliced
    L = len(raw)
    for l, lyr in enumerate(split_batch.layers):
        rl = raw[L - 1 - l]
        push = np.asarray(lyr.push_idx)
        recv = np.asarray(lyr.recv_idx)
        for p in range(P):
            for q in range(P):
                if p == q:
                    continue
                k_push = (push[p, q] >= 0).sum()
                k_recv = (recv[q, p] < lyr.dst_cap).sum()
                assert k_push == k_recv
                if k_push:
                    # recv rows must be within q's owned prefix
                    n_own_q = int(np.asarray(lyr.num_owned)[q])
                    rows = recv[q, p, :k_recv]
                    assert (rows < n_own_q).all()
                    # the nodes q receives from p are owned by q
                    own_q = rl.frontier[pmap[rl.frontier] == q]
                    assert (pmap[own_q[rows]] == q).all()


def test_slicer_degree_totals(sliced):
    """owned_deg == total sampled in-degree (incl self loop) of each node."""
    g, pmap, sampler, raw, split_batch, _ = sliced
    L = len(raw)
    for l, lyr in enumerate(split_batch.layers):
        rl = raw[L - 1 - l]
        deg = np.bincount(rl.e_dst, minlength=rl.frontier.shape[0])
        od = np.asarray(lyr.owned_deg)
        for p in range(P):
            n = int(np.asarray(lyr.num_owned)[p])
            own_rows = np.nonzero(pmap[rl.frontier] == p)[0]
            np.testing.assert_array_equal(od[p, :n], deg[own_rows])


def _gather_split_features(g, batch):
    x = np.stack(
        [
            np.asarray(gather_features(g.features, batch.input_nodes[p]))
            for p in range(batch.input_nodes.shape[0])
        ]
    )
    return jnp.asarray(x)


def test_split_forward_matches_single_chip(sliced):
    g, pmap, sampler, raw, split_batch, single_batch = sliced
    mesh = make_mesh(P)
    model_s = SAGEModel(g.feature_dim, 8, g.num_classes, 2)
    model_d = SplitSAGE(g.feature_dim, 8, g.num_classes, 2)
    params = model_s.init(jax.random.PRNGKey(0))

    x0 = gather_features(g.features, single_batch.input_nodes)
    single_logits = np.asarray(model_s.apply(params, single_batch, x0))

    fwd = make_split_forward(model_d, mesh)
    xs = _gather_split_features(g, split_batch)
    split_logits = np.asarray(fwd(params, split_batch, xs))

    targets = raw[0].frontier
    for p in range(P):
        rows = np.nonzero(pmap[targets] == p)[0]
        np.testing.assert_allclose(
            split_logits[p, : rows.shape[0]],
            single_logits[rows],
            rtol=1e-4,
            atol=1e-4,
        )


def test_split_grads_match_single_chip(sliced):
    g, pmap, sampler, raw, split_batch, single_batch = sliced
    mesh = make_mesh(P)
    model_s = SAGEModel(g.feature_dim, 8, g.num_classes, 2)
    model_d = SplitSAGE(g.feature_dim, 8, g.num_classes, 2)
    params = model_s.init(jax.random.PRNGKey(1))

    x0 = gather_features(g.features, single_batch.input_nodes)

    def single_loss(prm):
        logits = model_s.apply(prm, single_batch, x0)
        return masked_cross_entropy(logits, single_batch.labels)

    l_single, g_single = jax.value_and_grad(single_loss)(params)

    opt = optax.sgd(0.0)  # lr 0: step returns loss/grads without moving
    step = make_split_train_step(model_d, opt, mesh)
    xs = _gather_split_features(g, split_batch)
    opt_state = opt.init(params)
    _, _, l_split, correct, cnt = step(params, opt_state, split_batch, xs)

    np.testing.assert_allclose(float(l_split), float(l_single), rtol=1e-5)
    assert int(cnt) == raw[0].frontier.shape[0]

    # Gradients via explicit value_and_grad on the split loss.
    from jax.sharding import PartitionSpec as PS

    def split_loss(prm):
        from occ_gnn_tpu.parallel.model import _local_ce, _unstack

        def body(prm, layers, labels, xs):
            layers_l = [_unstack(l) for l in layers]
            logits = model_d.forward_local(prm, layers_l, xs[0])
            nll, cnt, _ = _local_ce(logits, labels[0])
            return jax.lax.psum(nll, "p") / jnp.maximum(
                jax.lax.psum(cnt, "p"), 1
            )

        mapped = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(PS(), PS("p"), PS("p"), PS("p")),
            out_specs=PS(),
            check_vma=False,
        )
        return mapped(prm, split_batch.layers, split_batch.labels, xs)

    g_split = jax.grad(split_loss)(params)
    flat_s, _ = jax.tree_util.tree_flatten(g_single)
    flat_d, _ = jax.tree_util.tree_flatten(g_split)
    for a, b in zip(flat_s, flat_d):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5
        )


def test_split_training_learns(community_graph):
    g = community_graph
    pmap = partition_graph(g, P, mode="greedy")
    model = SplitSAGE(g.feature_dim, 32, g.num_classes, 2)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    mesh = make_mesh(P)
    step = make_split_train_step(model, opt, mesh)
    sampler = SplitSampler(g, g.train_nodes(), pmap, P, [5, 5], 128, seed=0)
    acc = 0.0
    for epoch in range(4):
        correct = total = 0
        for batch in sampler:
            xs = _gather_split_features(g, batch)
            params, opt_state, loss, c, t = step(params, opt_state, batch, xs)
            correct += int(c)
            total += int(t)
        acc = correct / total
    assert acc > 0.9, f"split train acc {acc}"


def test_split_gcn_runs(sliced):
    g, pmap, sampler, raw, split_batch, _ = sliced
    mesh = make_mesh(P)
    model = SplitGCN(g.feature_dim, 8, g.num_classes, 2)
    params = model.init(jax.random.PRNGKey(3))
    fwd = make_split_forward(model, mesh)
    xs = _gather_split_features(g, split_batch)
    logits = np.asarray(fwd(params, split_batch, xs))
    assert np.isfinite(logits).all()


def test_split_gat_matches_single_chip(sliced):
    """Distributed GAT (2-shuffle streaming softmax) == single-chip GAT."""
    from occ_gnn_tpu.models import GATModel
    from occ_gnn_tpu.parallel.model import SplitGAT

    g, pmap, sampler, raw, split_batch, single_batch = sliced
    mesh = make_mesh(P)
    K, H = 2, 6
    model_s = GATModel(g.feature_dim, H, g.num_classes, 2, num_heads=K)
    model_d = SplitGAT(g.feature_dim, H, g.num_classes, 2, num_heads=K)
    params = model_s.init(jax.random.PRNGKey(11))

    x0 = gather_features(g.features, single_batch.input_nodes)
    logits_single = np.asarray(model_s.apply(params, single_batch, x0))

    fwd = make_split_forward(model_d, mesh)
    xs = _gather_split_features(g, split_batch)
    logits_split = np.asarray(fwd(params, split_batch, xs))

    targets = raw[0].frontier
    for p in range(P):
        rows = np.nonzero(pmap[targets] == p)[0]
        np.testing.assert_allclose(
            logits_split[p, : rows.shape[0]],
            logits_single[rows],
            rtol=1e-4,
            atol=1e-4,
        )


def test_split_gat_dense_matches_coo(sliced):
    """GAT's dense fanout-K attention (gather-only, the TPU fast path)
    equals the COO segment-softmax path on the same sliced batch."""
    import dataclasses

    from occ_gnn_tpu.parallel.model import SplitGAT

    g, pmap, sampler, raw, split_batch, _ = sliced
    mesh = make_mesh(P)
    model = SplitGAT(g.feature_dim, 6, g.num_classes, 2, num_heads=2)
    params = model.init(jax.random.PRNGKey(12))
    xs = _gather_split_features(g, split_batch)
    fwd = make_split_forward(model, mesh)
    assert all(l.nbr_idx is not None for l in split_batch.layers)
    logits_dense = np.asarray(fwd(params, split_batch, xs))
    coo_batch = dataclasses.replace(
        split_batch,
        layers=[dataclasses.replace(l, nbr_idx=None)
                for l in split_batch.layers],
    )
    logits_coo = np.asarray(fwd(params, coo_batch, xs))
    np.testing.assert_allclose(logits_dense, logits_coo,
                               rtol=1e-4, atol=1e-4)


def test_split_gat_batched_matches_online(sliced):
    """The batched two-pass attention (default) equals the online-softmax
    fallback bit-for-bit up to float association."""
    from occ_gnn_tpu.ops import config as ops_config
    from occ_gnn_tpu.parallel.model import SplitGAT

    g, pmap, sampler, raw, split_batch, _ = sliced
    mesh = make_mesh(P)
    model = SplitGAT(g.feature_dim, 6, g.num_classes, 2, num_heads=2)
    params = model.init(jax.random.PRNGKey(13))
    xs = _gather_split_features(g, split_batch)
    assert all(l.nbr_idx is not None for l in split_batch.layers)
    old = ops_config.gat_attention_impl()
    try:
        ops_config.set_gat_attention_impl("batched")
        logits_b = np.asarray(make_split_forward(model, mesh)(
            params, split_batch, xs))
        ops_config.set_gat_attention_impl("online")
        # impl is read at trace time: a fresh forward picks it up.
        logits_o = np.asarray(make_split_forward(model, mesh)(
            params, split_batch, xs))
    finally:
        ops_config.set_gat_attention_impl(old)
    np.testing.assert_allclose(logits_b, logits_o, rtol=1e-4, atol=1e-4)


def test_split_bf16_training_learns(community_graph):
    """bf16 activations/cache (f32 accumulation) must still converge."""
    g = community_graph
    pmap = partition_graph(g, P, mode="greedy")
    model = SplitSAGE(g.feature_dim, 32, g.num_classes, 2,
                      dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    mesh = make_mesh(P)
    step = make_split_train_step(model, opt, mesh)
    sampler = SplitSampler(g, g.train_nodes(), pmap, P, [5, 5], 128, seed=0)
    acc = 0.0
    for epoch in range(4):
        correct = total = 0
        for batch in sampler:
            xs = _gather_split_features(g, batch).astype(jnp.bfloat16)
            params, opt_state, loss, c, t = step(params, opt_state, batch,
                                                 xs)
            correct += int(c)
            total += int(t)
        acc = correct / total
    assert acc > 0.85, f"bf16 split train acc {acc}"


def test_slicer_skewed_batch_single_partition(small_graph):
    """A batch whose targets all live in ONE partition still slices and
    runs (other partitions have zero owned nodes in the outer layer)."""
    g = small_graph
    pmap = partition_graph(g, P, mode="greedy")
    own0 = np.nonzero(pmap == 0)[0][:24]
    sampler = SplitSampler(g, g.train_nodes(), pmap, P, [3, 3], 24, seed=9)
    batch = sampler.sample_batch(own0)
    num_owned = np.asarray(batch.layers[-1].num_owned)
    assert num_owned[0] == own0.shape[0]
    assert num_owned[1:].sum() == 0
    mesh = make_mesh(P)
    model = SplitSAGE(g.feature_dim, 8, g.num_classes, 2)
    params = model.init(jax.random.PRNGKey(4))
    fwd = make_split_forward(model, mesh)
    xs = _gather_split_features(g, batch)
    logits = np.asarray(fwd(params, batch, xs))
    assert np.isfinite(logits[0, : int(num_owned[0])]).all()


def test_slicer_isolated_nodes():
    """Nodes with zero in-degree sample only their self loop."""
    from occ_gnn_tpu.data.graph import from_edge_list

    n = 64
    # only nodes 0..9 have edges; the rest are isolated
    src = np.arange(10)
    dst = (np.arange(10) + 1) % 10
    feats = np.random.default_rng(0).standard_normal((n, 8)).astype(np.float32)
    labels = np.zeros(n, np.int32)
    g = from_edge_list(src, dst, n, feats, labels, 2)
    pmap = (np.arange(n) % P).astype(np.int32)
    sampler = SplitSampler(g, np.arange(n), pmap, P, [3], 32, seed=0)
    batch = sampler.sample_batch(np.arange(32))
    deg = np.asarray(batch.layers[0].owned_deg)
    mask = np.asarray(batch.layers[0].owned_mask)
    assert (deg[mask] >= 1).all()  # every node has at least the self loop


@pytest.mark.parametrize("seed,mode,fanouts,bs,parts", [
    (21, "round_robin", [3, 3], 48, 4),
    (22, "random", [5], 96, 8),
    (23, "greedy", [2, 2, 2], 24, 4),
    (24, "greedy", [-1, 3], 16, 4),
])
def test_slicer_fuzz_invariants(seed, mode, fanouts, bs, parts):
    """Randomized sweep of graph x partitioner x fanouts: conservation,
    owned coverage, push/recv pairing must hold everywhere."""
    from occ_gnn_tpu.data import random_graph

    g = random_graph(num_nodes=400, avg_degree=5, feature_dim=8,
                     num_classes=4, seed=seed)
    pmap = partition_graph(g, parts, mode=mode, attach=False)
    sampler = SplitSampler(g, g.train_nodes(), pmap, parts, fanouts, bs,
                           seed=seed)
    nodes = g.train_nodes()[:bs]
    raw = sampler._sample_raw(nodes)
    batch = sampler.slice_raw(raw)
    L = len(raw)
    for l, lyr in enumerate(batch.layers):
        rl = raw[L - 1 - l]
        dst = np.asarray(lyr.edge_dst)
        assert (dst < lyr.dst_cap).sum() == rl.e_dst.shape[0]
        assert int(np.asarray(lyr.num_owned).sum()) == rl.frontier.shape[0]
        push = np.asarray(lyr.push_idx)
        recv = np.asarray(lyr.recv_idx)
        for p in range(parts):
            for q in range(parts):
                if p != q:
                    assert (push[p, q] >= 0).sum() == \
                        (recv[q, p] < lyr.dst_cap).sum()


def test_dense_nbr_matches_coo_aggregation(sliced):
    """The dense [K_cap, D_cap] neighbor matrix reproduces the COO
    scatter-add partial sums exactly (gather-only aggregation — the TPU
    fast path; padding slots point at the reserved zero row)."""
    from occ_gnn_tpu.parallel.split import local_aggregate, local_aggregate_dense

    g, pmap, sampler, raw, split_batch, _ = sliced
    rng = np.random.default_rng(0)
    for lyr in split_batch.layers:
        assert lyr.nbr_idx is not None
        Pn, K, D_cap = lyr.nbr_idx.shape
        x = rng.standard_normal((Pn, lyr.src_cap, 16)).astype(np.float32)
        x[:, lyr.src_cap - 1, :] = 0.0  # reserved zero row
        for p in range(Pn):
            xp = jnp.asarray(x[p])
            coo = local_aggregate(
                xp, lyr.edge_src[p], lyr.edge_dst[p], lyr.dst_cap
            )
            dense = local_aggregate_dense(xp, lyr.nbr_idx[p])
            np.testing.assert_allclose(
                np.asarray(coo), np.asarray(dense), rtol=1e-5, atol=1e-5
            )


def test_dense_agg_tiled_matches_unrolled(sliced, monkeypatch):
    """The 'tiled' lax.scan lowering of the dense aggregation produces the
    same partial sums as the default 'unrolled' lowering (the tile size is
    shrunk so the scan path actually engages at test shapes)."""
    from occ_gnn_tpu.ops import config as ops_config
    from occ_gnn_tpu.parallel import split as split_mod

    g, pmap, sampler, raw, split_batch, _ = sliced
    rng = np.random.default_rng(1)
    monkeypatch.setattr(split_mod, "_DENSE_TILE", 8)
    lyr = split_batch.layers[0]
    assert lyr.nbr_idx is not None and lyr.nbr_idx.shape[-1] > 8
    x = rng.standard_normal((lyr.src_cap, 16)).astype(np.float32)
    x[lyr.src_cap - 1, :] = 0.0  # reserved zero row
    xp = jnp.asarray(x)
    try:
        ops_config.set_dense_agg_impl("unrolled")
        unrolled = split_mod.local_aggregate_dense(xp, lyr.nbr_idx[0])
        ops_config.set_dense_agg_impl("tiled")
        tiled = split_mod.local_aggregate_dense(xp, lyr.nbr_idx[0])
    finally:
        ops_config.set_dense_agg_impl("unrolled")
    np.testing.assert_allclose(
        np.asarray(unrolled), np.asarray(tiled), rtol=1e-5, atol=1e-5
    )


def test_dense_nbr_never_references_reserved_row(sliced):
    """The slicer never assigns a real src to the reserved zero row, and
    every valid edge appears exactly once in the dense matrix."""
    g, pmap, sampler, raw, split_batch, _ = sliced
    for lyr in split_batch.layers:
        nbr = np.asarray(lyr.nbr_idx)
        es = np.asarray(lyr.edge_src)
        ed = np.asarray(lyr.edge_dst)
        sentinel = lyr.src_cap - 1
        for p in range(nbr.shape[0]):
            valid = ed[p] < lyr.dst_cap
            # real srcs never use the sentinel id
            assert (es[p][valid] != sentinel).all()
            # dense valid entry count == COO valid edge count
            assert (nbr[p] != sentinel).sum() == valid.sum()


def test_split_dropout_applied_and_guarded(sliced):
    """--dropout in split mode must actually drop (VERDICT r3 weak #3):
    with an rng the masked forward differs across keys and from eval;
    without an rng the train step on a dropout model fails fast instead of
    silently skipping regularization."""
    g, pmap, sampler, raw, split_batch, _ = sliced
    mesh = make_mesh(P)
    model = SplitSAGE(g.feature_dim, 16, g.num_classes, 2, dropout=0.5)
    params = model.init(jax.random.PRNGKey(5))
    xs = _gather_split_features(g, split_batch)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_split_train_step(model, opt, mesh)

    # Guard: dropout model + no rng -> hard error, not a silent no-op.
    with pytest.raises(ValueError, match="dropout"):
        step(params, opt_state, split_batch, xs)

    # Two different keys give different losses; eval (forward) is
    # deterministic and differs from the dropped forward.
    p1, _, loss_a, _, _ = step(
        params, opt_state, split_batch, xs, rng=jax.random.PRNGKey(1)
    )
    p2, _, loss_b, _, _ = step(
        params, opt_state, split_batch, xs, rng=jax.random.PRNGKey(2)
    )
    assert float(loss_a) != float(loss_b)
    # Same key is reproducible.
    p3, _, loss_c, _, _ = step(
        params, opt_state, split_batch, xs, rng=jax.random.PRNGKey(1)
    )
    assert float(loss_a) == float(loss_c)
    leaves1 = jax.tree_util.tree_leaves(p1)
    leaves3 = jax.tree_util.tree_leaves(p3)
    for a, b in zip(leaves1, leaves3):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_split_dropout_single_device_path():
    """The P=1 (no-shard_map) step honors dropout + rng too."""
    from occ_gnn_tpu.data import random_graph

    g = random_graph(num_nodes=200, avg_degree=5, feature_dim=8,
                     num_classes=3, seed=0)
    pmap = np.zeros(g.num_nodes, dtype=np.int32)
    sampler = SplitSampler(g, g.train_nodes(), pmap, 1, [3, 3], 16, seed=0)
    batch = sampler.sample_batch(g.train_nodes()[:16])
    model = SplitSAGE(g.feature_dim, 8, g.num_classes, 2, dropout=0.5)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_split_train_step(model, opt, make_mesh(1))
    xs = _gather_split_features(g, batch)
    with pytest.raises(ValueError, match="dropout"):
        step(params, opt_state, batch, xs)
    _, _, la, _, _ = step(params, opt_state, batch, xs,
                          rng=jax.random.PRNGKey(1))
    _, _, lb, _, _ = step(params, opt_state, batch, xs,
                          rng=jax.random.PRNGKey(2))
    assert float(la) != float(lb)


def test_split_gat_fma_matches_einsum(sliced):
    """The two lowerings of the batched-GAT weighted partial sum
    (OCC_GAT_AGG fma / einsum) agree — keeps the non-default branch
    covered (ADVICE r3: neither was exercised by any test)."""
    from occ_gnn_tpu.ops import config as ops_config
    from occ_gnn_tpu.parallel.model import SplitGAT

    g, pmap, sampler, raw, split_batch, _ = sliced
    mesh = make_mesh(P)
    model = SplitGAT(g.feature_dim, 6, g.num_classes, 2, num_heads=2)
    params = model.init(jax.random.PRNGKey(13))
    xs = _gather_split_features(g, split_batch)
    old = ops_config.gat_agg_impl()
    try:
        ops_config.set_gat_agg_impl("fma")
        logits_f = np.asarray(make_split_forward(model, mesh)(
            params, split_batch, xs))
        ops_config.set_gat_agg_impl("einsum")
        logits_e = np.asarray(make_split_forward(model, mesh)(
            params, split_batch, xs))
    finally:
        ops_config.set_gat_agg_impl(old)
    np.testing.assert_allclose(logits_f, logits_e, rtol=1e-4, atol=1e-4)


def test_split_gat_tiled_matches_batched(sliced, monkeypatch):
    """The tiled (scan-over-dst-tiles, project-then-weight) attention
    lowering equals the batched two-pass form."""
    from occ_gnn_tpu.ops import config as ops_config
    from occ_gnn_tpu.parallel.model import SplitGAT

    g, pmap, sampler, raw, split_batch, _ = sliced
    mesh = make_mesh(P)
    model = SplitGAT(g.feature_dim, 6, g.num_classes, 2, num_heads=2)
    params = model.init(jax.random.PRNGKey(13))
    xs = _gather_split_features(g, split_batch)
    monkeypatch.setenv("OCC_GAT_TILE", "32")  # force several tiles
    old = ops_config.gat_attention_impl()
    try:
        ops_config.set_gat_attention_impl("batched")
        logits_b = np.asarray(make_split_forward(model, mesh)(
            params, split_batch, xs))
        ops_config.set_gat_attention_impl("tiled")
        logits_t = np.asarray(make_split_forward(model, mesh)(
            params, split_batch, xs))
    finally:
        ops_config.set_gat_attention_impl(old)
    np.testing.assert_allclose(logits_b, logits_t, rtol=1e-4, atol=1e-4)


def test_split_gat_tiled_trains(sliced, monkeypatch):
    """Gradients flow through the tiled attention scan."""
    from occ_gnn_tpu.ops import config as ops_config
    from occ_gnn_tpu.parallel.model import SplitGAT

    g, pmap, sampler, raw, split_batch, _ = sliced
    mesh = make_mesh(P)
    model = SplitGAT(g.feature_dim, 6, g.num_classes, 2, num_heads=2)
    params = model.init(jax.random.PRNGKey(14))
    xs = _gather_split_features(g, split_batch)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    monkeypatch.setenv("OCC_GAT_TILE", "32")
    old = ops_config.gat_attention_impl()
    try:
        ops_config.set_gat_attention_impl("tiled")
        step = make_split_train_step(model, opt, mesh)
        p2, _, loss, _, _ = step(params, opt_state, split_batch, xs)
    finally:
        ops_config.set_gat_attention_impl(old)
    assert np.isfinite(float(loss))
    diff = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        params, p2,
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0
