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


def test_convert_ogb_with_fake_dataset(tmp_path, monkeypatch):
    """Exercise the OGB converter end-to-end against a stub
    NodePropPredDataset exposing the real OGB format (edge_index,
    node_feat, -1 labels, idx splits) — the converter must produce a
    loadable checksummed binary dir with the split masks intact."""
    import sys
    import types

    import numpy as np

    rng = np.random.default_rng(0)
    n, e = 60, 300
    graph_data = {
        "num_nodes": n,
        "edge_index": rng.integers(0, n, (2, e), dtype=np.int64),
        "node_feat": rng.standard_normal((n, 8)).astype(np.float32),
    }
    labels = rng.integers(0, 5, (n, 1)).astype(np.int64)
    labels[0, 0] = -1  # unlabeled node, ogb convention

    class FakeDS:
        def __init__(self, name):
            assert name == "ogbn-fake"

        def __getitem__(self, i):
            return graph_data, labels

        def get_idx_split(self):
            return {"train": np.arange(0, 40), "valid": np.arange(40, 50),
                    "test": np.arange(50, 60)}

    mod = types.ModuleType("ogb.nodeproppred")
    mod.NodePropPredDataset = FakeDS
    pkg = types.ModuleType("ogb")
    pkg.nodeproppred = mod
    monkeypatch.setitem(sys.modules, "ogb", pkg)
    monkeypatch.setitem(sys.modules, "ogb.nodeproppred", mod)

    from occ_gnn_tpu.data.convert import convert_ogb
    from occ_gnn_tpu.data.binary_format import load_graph

    out = convert_ogb("ogbn-fake", str(tmp_path), partitions=4,
                      mode="greedy")
    g = load_graph(str(tmp_path), "ogbn-fake")
    assert g.num_nodes == n
    assert g.feature_dim == 8
    assert g.train_mask.sum() == 40
    assert g.val_mask.sum() == 10
    assert g.test_mask.sum() == 10
    assert g.partition_map is not None and g.partition_map.max() == 3
    # dedup'd CSR: every (src,dst) pair from edge_index must be present
    dst_of = np.repeat(np.arange(n), np.diff(g.indptr))
    pairs = set(zip(g.indices.tolist(), dst_of.tolist()))
    for s, d in zip(*graph_data["edge_index"]):
        assert (int(s), int(d)) in pairs
