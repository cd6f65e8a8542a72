"""Dataset layer tests: graph container, binary format roundtrip with
checksum validation (reference pattern: convert writes checksums,
cslicer/dataset.cpp asserts them), partitioners."""

import numpy as np
import pytest

from occ_gnn_tpu.data import (
    Graph,
    block_graph,
    load_graph,
    partition_graph,
    random_graph,
    save_graph,
)
from occ_gnn_tpu.data.partition import edge_cut_fraction


def test_graph_invariants(small_graph):
    g = small_graph
    assert g.num_nodes == 500
    assert g.indptr.shape[0] == g.num_nodes + 1
    assert int(g.indptr[-1]) == g.num_edges
    assert g.in_degrees().sum() == g.num_edges
    assert g.out_degrees().sum() == g.num_edges
    assert g.features.shape == (500, 16)
    # masks partition the node set
    total = g.train_mask.sum() + g.val_mask.sum() + g.test_mask.sum()
    assert total == g.num_nodes


def test_binary_roundtrip(tmp_path, small_graph):
    g = small_graph
    partition_graph(g, 4, mode="round_robin")
    save_graph(g, str(tmp_path), "tiny")
    g2 = load_graph(str(tmp_path), "tiny")
    np.testing.assert_array_equal(g.indptr, g2.indptr)
    np.testing.assert_array_equal(g.indices, g2.indices)
    np.testing.assert_allclose(g.features, g2.features)
    np.testing.assert_array_equal(g.labels, g2.labels)
    np.testing.assert_array_equal(g.partition_map, g2.partition_map)
    np.testing.assert_array_equal(g.train_mask, g2.train_mask)
    assert g2.num_classes == g.num_classes


def test_checksum_detects_corruption(tmp_path, small_graph):
    import os

    save_graph(small_graph, str(tmp_path), "c")
    path = os.path.join(str(tmp_path), "c", "indices.bin")
    data = np.fromfile(path, dtype=np.int64)
    data[0] += 1
    data.tofile(path)
    with pytest.raises(AssertionError, match="edge checksum"):
        load_graph(str(tmp_path), "c")


@pytest.mark.parametrize("mode", ["round_robin", "random", "greedy"])
def test_partition_modes(small_graph, mode):
    pmap = partition_graph(small_graph, 4, mode=mode, attach=False)
    assert pmap.shape == (small_graph.num_nodes,)
    assert pmap.min() >= 0 and pmap.max() < 4
    counts = np.bincount(pmap, minlength=4)
    assert counts.min() > 0


def test_greedy_beats_random_cut():
    g = block_graph(num_nodes=600, num_blocks=4, avg_degree=8,
                    cross_fraction=0.05, seed=3)
    rand = partition_graph(g, 4, mode="random", attach=False)
    greedy = partition_graph(g, 4, mode="greedy", attach=False)
    assert edge_cut_fraction(g, greedy) < edge_cut_fraction(g, rand)


def test_greedy_balance():
    g = random_graph(num_nodes=1000, avg_degree=8, seed=4)
    pmap = partition_graph(g, 4, mode="greedy", attach=False)
    deg = g.in_degrees() + g.out_degrees() + 1
    loads = np.array([deg[pmap == p].sum() for p in range(4)], dtype=float)
    assert loads.max() / loads.mean() < 1.25


def test_pad_feature_dim_inert(small_graph):
    """Zero-padding features to 128 lanes changes no training math."""
    g = small_graph
    gp = g.pad_feature_dim(128)
    assert gp.feature_dim == 128
    assert gp.num_edges == g.num_edges
    np.testing.assert_array_equal(gp.features[:, : g.feature_dim],
                                  g.features)
    assert (gp.features[:, g.feature_dim:] == 0).all()
    # already-aligned: no-op (same object)
    assert gp.pad_feature_dim(128) is gp


def test_gpmetis_passthrough_with_fake_binary(small_graph, tmp_path,
                                              monkeypatch):
    """Validate the METIS writer/parser round trip without gpmetis
    installed: a stub `gpmetis` on PATH checks the input format invariants
    (header edge count, symmetry, 1-indexing, no self loops, degree
    vertex weights) and emits a valid .part file the parser must load."""
    import os
    import stat
    import sys

    from occ_gnn_tpu.data.partition import partition_graph

    stub = tmp_path / "gpmetis"
    stub.write_text(f"""#!{sys.executable}
import sys
path, k = sys.argv[1], int(sys.argv[2])
lines = open(path).read().splitlines()
n, m, fmt = lines[0].split()
n, m = int(n), int(m)
assert fmt == "010", fmt
assert len(lines) == n + 1
edges = set()
for v, line in enumerate(lines[1:]):
    toks = line.split()
    w = int(toks[0])          # degree+1 vertex weight
    assert w >= 1
    for u in toks[1:]:
        u = int(u)
        assert 1 <= u <= n and u != v + 1
        edges.add((v + 1, u))
assert len(edges) == 2 * m, (len(edges), m)
for a, b in edges:
    assert (b, a) in edges    # symmetric
with open(f"{{path}}.part.{{k}}", "w") as fp:
    for v in range(n):
        fp.write(f"{{v % k}}\\n")
""")
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}{os.pathsep}" + os.environ["PATH"])
    pmap = partition_graph(small_graph, 4, mode="metis", attach=False)
    np.testing.assert_array_equal(
        pmap, np.arange(small_graph.num_nodes) % 4
    )
