"""Converter CLI and checkpoint/resume tests."""

import os

import numpy as np
import pytest

import jax
import optax


def test_synth_converter_roundtrip(tmp_path):
    from occ_gnn_tpu.data import load_graph
    from occ_gnn_tpu.data.convert import main as convert_main

    convert_main(["synth", "--name", "s1", "--root", str(tmp_path),
                  "--num-nodes", "500", "--avg-degree", "5",
                  "--feature-dim", "16", "--partitions", "4"])
    g = load_graph(str(tmp_path), "s1")
    assert g.num_nodes == 500
    assert g.partition_map is not None
    assert g.partition_map.max() == 3
    assert g.train_mask is not None


def test_edgelist_converter(tmp_path):
    from occ_gnn_tpu.data import load_graph
    from occ_gnn_tpu.data.convert import main as convert_main

    rng = np.random.default_rng(0)
    edges = rng.integers(0, 200, size=(1000, 2))
    path = os.path.join(str(tmp_path), "edges.txt")
    np.savetxt(path, edges, fmt="%d", header="src dst")
    convert_main(["edgelist", "--input", path, "--name", "el", "--root",
                  str(tmp_path), "--feature-dim", "8", "--partitions", "2"])
    g = load_graph(str(tmp_path), "el")
    assert g.num_edges > 0
    assert g.feature_dim == 8


def test_checkpoint_roundtrip(tmp_path):
    from occ_gnn_tpu.models import SAGEModel
    from occ_gnn_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    model = SAGEModel(8, 16, 4, 2)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    path = os.path.join(str(tmp_path), "ckpt.npz")
    save_checkpoint(path, params, opt_state, epoch=7)

    params2 = model.init(jax.random.PRNGKey(1))  # different values
    opt_state2 = opt.init(params2)
    restored, ropt, epoch = load_checkpoint(path, params2, opt_state2)
    assert epoch == 7
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too
    for a, b in zip(jax.tree_util.tree_leaves(opt_state),
                    jax.tree_util.tree_leaves(ropt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_shape_mismatch_raises(tmp_path):
    from occ_gnn_tpu.models import SAGEModel
    from occ_gnn_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    model = SAGEModel(8, 16, 4, 2)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    path = os.path.join(str(tmp_path), "c.npz")
    save_checkpoint(path, params, opt_state, epoch=1)

    other = SAGEModel(8, 32, 4, 2)  # different hidden size
    p2 = other.init(jax.random.PRNGKey(0))
    with pytest.raises(AssertionError, match="shape mismatch"):
        load_checkpoint(path, p2, opt.init(p2))
