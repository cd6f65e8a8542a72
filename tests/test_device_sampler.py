"""Device-side dense sampler (quiver-baseline analog) tests.

Parity strategy: on a graph where every node has exactly one in-neighbor
(a ring) with fanout 1, sampling is deterministic regardless of RNG, so
the fully-on-device dense path must produce the SAME logits as the host
padded-COO path (models/sage.py via NeighborSampler) — both compute
mean(self, the_one_neighbor) per layer.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax


def _ring_graph(n=64, feature_dim=8, num_classes=4, seed=0):
    from occ_gnn_tpu.data.graph import Graph

    rng = np.random.default_rng(seed)
    indptr = np.arange(n + 1, dtype=np.int64)
    indices = ((np.arange(n) - 1) % n).astype(np.int64)
    return Graph(
        indptr=indptr,
        indices=indices,
        features=rng.standard_normal((n, feature_dim)).astype(np.float32),
        labels=rng.integers(0, num_classes, n).astype(np.int32),
        num_classes=num_classes,
        train_mask=np.ones(n, dtype=bool),
    )


def test_dense_matches_host_path_on_ring():
    from occ_gnn_tpu.models import SAGEModel
    from occ_gnn_tpu.sampling.device_sampler import device_csr, dense_logits
    from occ_gnn_tpu.sampling.neighbor import NeighborSampler
    from occ_gnn_tpu.training import gather_features

    g = _ring_graph()
    fanouts = [1, 1]
    model = SAGEModel(g.feature_dim, 16, g.num_classes, 2)
    params = model.init(jax.random.PRNGKey(0))

    targets = np.arange(0, 32, dtype=np.int64)
    sampler = NeighborSampler(g, targets, fanouts, 32, seed=0)
    batch = sampler.sample_batch(targets)
    x0 = gather_features(g.features, batch.input_nodes)
    host_logits = np.asarray(model.apply(params, batch, x0))[: len(targets)]

    dev = dense_logits(
        params, device_csr(g), jnp.asarray(g.features),
        jnp.asarray(targets, dtype=jnp.int32), fanouts,
        jax.random.PRNGKey(7),
    )
    np.testing.assert_allclose(np.asarray(dev), host_logits,
                               rtol=1e-5, atol=1e-5)


def test_zero_degree_nodes_sample_self():
    from occ_gnn_tpu.data.graph import Graph
    from occ_gnn_tpu.sampling.device_sampler import (
        device_csr,
        sample_neighbors_dense,
    )

    # Nodes 0..3 isolated, node 4 has in-neighbors {0, 1}.
    indptr = np.array([0, 0, 0, 0, 0, 2], dtype=np.int64)
    indices = np.array([0, 1], dtype=np.int64)
    g = Graph(indptr=indptr, indices=indices,
              features=np.zeros((5, 4), np.float32),
              labels=np.zeros(5, np.int32), num_classes=2)
    nbr = sample_neighbors_dense(
        device_csr(g), jnp.arange(5, dtype=jnp.int32), 3,
        jax.random.PRNGKey(0),
    )
    nbr = np.asarray(nbr)
    for v in range(4):
        assert (nbr[v] == v).all()  # isolated -> self
    assert np.isin(nbr[4], [0, 1]).all()


def test_dense_frontier_shapes_static():
    from occ_gnn_tpu.sampling.device_sampler import device_csr, dense_frontiers

    g = _ring_graph(n=128)
    fr = dense_frontiers(device_csr(g), jnp.zeros(8, jnp.int32), [3, 2],
                         jax.random.PRNGKey(0))
    assert [int(f.shape[0]) for f in fr] == [8, 8 * 4, 8 * 4 * 3]


def test_device_sample_trainer_converges(community_graph):
    """Full fused-step DP training on the 8-device CPU mesh."""
    from occ_gnn_tpu.models import SAGEModel
    from occ_gnn_tpu.parallel.split import make_mesh
    from occ_gnn_tpu.sampling.device_sampler import DeviceSampleTrainer

    g = community_graph
    mesh = make_mesh(8)
    fanouts = [4, 4]
    model = SAGEModel(g.feature_dim, 16, g.num_classes, 2)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(0.01)
    opt_state = opt.init(params)
    drv = DeviceSampleTrainer(g, fanouts, 128, mesh, opt, seed=0)
    nodes = g.train_nodes()
    losses = []
    acc = 0.0
    for _ in range(3):
        params, opt_state, loss, correct, total = drv.train_epoch(
            params, opt_state, nodes
        )
        losses.append(loss)
        acc = correct / max(total, 1)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert acc > 0.5


def test_cli_quiver_mode():
    from occ_gnn_tpu import train as trainer

    m = trainer.main([
        "--graph", "community", "--num-nodes", "1500", "--fan-out", "4,4",
        "--batch-size", "128", "--num-hidden", "16", "--num-epochs", "2",
        "--feature-dim", "16", "--cpu", "--mode", "quiver",
    ])
    assert np.isfinite(m["loss"])
    assert m["acc"] > 0.5
