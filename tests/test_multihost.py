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
