"""Multi-host assembly path (single-process degenerate form): the wrapped
sampler must produce properly sharded global arrays that train identically
to the plain path."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from occ_gnn_tpu.data import partition_graph
from occ_gnn_tpu.parallel.model import SplitSAGE, make_split_train_step
from occ_gnn_tpu.parallel.multihost import (
    MultiHostSplitSampler,
    local_partition_range,
)
from occ_gnn_tpu.parallel.split import make_mesh
from occ_gnn_tpu.sampling.slicer import SplitSampler
from occ_gnn_tpu.training import gather_features

P = 4


def test_local_partition_range_single_process():
    mesh = make_mesh(P)
    lo, hi = local_partition_range(mesh)
    assert (lo, hi) == (0, P)


def test_multihost_sampler_trains(small_graph):
    g = small_graph
    pmap = partition_graph(g, P, mode="greedy")
    mesh = make_mesh(P)
    inner = SplitSampler(g, g.train_nodes(), pmap, P, [4, 3], 32, seed=3)
    mh = MultiHostSplitSampler(inner, mesh)
    assert len(mh) == len(inner)

    model = SplitSAGE(g.feature_dim, 8, g.num_classes, 2)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    step = make_split_train_step(model, opt, mesh)
    batch = mh.sample_batch(g.train_nodes()[:32])
    # arrays carry the mesh sharding on the leading axis
    shard_devs = {
        s.device for s in batch.layers[0].edge_src.addressable_shards
    }
    assert len(shard_devs) == P
    xs = jnp.stack([
        gather_features(g.features, np.asarray(batch.input_nodes)[p])
        for p in range(P)
    ])
    params, opt_state, loss, correct, cnt = step(params, opt_state, batch, xs)
    assert np.isfinite(float(loss))
    assert int(cnt) > 0


def test_replicated_sampling_is_deterministic(small_graph):
    """The multihost design rests on this: two sampler replicas with the
    same seed must produce IDENTICAL batches with no communication."""
    g = small_graph
    pmap = partition_graph(g, P, mode="greedy")

    def run():
        s = SplitSampler(g, g.train_nodes(), pmap, P, [4, 3], 64, seed=11)
        out = []
        for batch in s:
            out.append(batch)
        return out

    a, b = run(), run()
    assert len(a) == len(b)
    for ba, bb in zip(a, b):
        for la, lb in zip(ba.layers, bb.layers):
            np.testing.assert_array_equal(np.asarray(la.edge_src),
                                          np.asarray(lb.edge_src))
            np.testing.assert_array_equal(np.asarray(la.edge_dst),
                                          np.asarray(lb.edge_dst))
        np.testing.assert_array_equal(np.asarray(ba.labels),
                                      np.asarray(bb.labels))


def test_native_replicated_sampling_deterministic(small_graph):
    """Same invariant for the C++ service (deterministic at fanout >= max
    degree; per-batch RNG is seeded identically across replicas)."""
    from occ_gnn_tpu.sampling.native import NativeSplitSampler

    g = small_graph
    pmap = partition_graph(g, P, mode="greedy")
    fan = int(g.in_degrees().max())

    def run(workers):
        s = NativeSplitSampler(g, g.train_nodes(), pmap, P, [fan], 64,
                               seed=11, num_workers=workers)
        out = [b for b in s]
        s.close()
        return out

    # 1 worker vs 2 workers: samples must arrive in submission order
    # regardless of completion order (the reorder buffer guarantees it).
    a, b = run(1), run(2)
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(ba.labels),
                                      np.asarray(bb.labels))
        np.testing.assert_array_equal(
            np.asarray(ba.layers[0].edge_src),
            np.asarray(bb.layers[0].edge_src),
        )


def test_native_random_sampling_worker_independent(small_graph):
    """With RANDOM fanouts (fanout < degree), batch content must still be
    identical across runs with different worker counts: the RNG is seeded
    per (service seed, batch seq), not per worker."""
    from occ_gnn_tpu.sampling.native import NativeSplitSampler

    g = small_graph
    pmap = partition_graph(g, P, mode="greedy")

    def run(workers):
        s = NativeSplitSampler(g, g.train_nodes(), pmap, P, [2, 2], 64,
                               seed=13, num_workers=workers)
        out = [b for b in s]
        s.close()
        return out

    a, b = run(1), run(2)
    for ba, bb in zip(a, b):
        for la, lb in zip(ba.layers, bb.layers):
            np.testing.assert_array_equal(np.asarray(la.edge_src),
                                          np.asarray(lb.edge_src))
            np.testing.assert_array_equal(np.asarray(la.edge_dst),
                                          np.asarray(lb.edge_dst))
