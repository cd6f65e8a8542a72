"""On-disk binary dataset format with checksum validation.

Directory layout (same field semantics as the reference's converter/loader
pair — /root/reference/python/utils/convert_dgl_dataset.py:42-128 writes and
/root/reference/cslicer/dataset.cpp:70-113 reads an equivalent format):

    <root>/<name>/meta.txt              key=value metadata + checksums
    <root>/<name>/indptr.bin            int64[num_nodes+1]
    <root>/<name>/indices.bin           int64[num_edges]
    <root>/<name>/features.bin          float32[num_nodes * feature_dim]
    <root>/<name>/labels.bin            int32[num_nodes]
    <root>/<name>/partition_map.bin     int32[num_nodes]        (optional)
    <root>/<name>/train_mask.bin        uint8[num_nodes]        (optional)

Checksums are asserted at load time (reference pattern: dataset.cpp:27-57)
so that converter and trainer can never silently disagree about the bytes.
"""

from __future__ import annotations

import os

import numpy as np

from occ_gnn_tpu.data.graph import Graph

_META = "meta.txt"


def _csum_int(a: np.ndarray) -> int:
    # Sum in int64 with wraparound — cheap, order-independent, catches
    # truncation/reordering of id arrays.
    return int(np.sum(a.astype(np.int64, copy=False), dtype=np.int64))


def _csum_float(a: np.ndarray) -> float:
    return float(np.sum(a.astype(np.float64, copy=False)))


def save_graph(graph: Graph, root: str, name: str) -> str:
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    graph.indptr.tofile(os.path.join(d, "indptr.bin"))
    graph.indices.tofile(os.path.join(d, "indices.bin"))
    graph.features.tofile(os.path.join(d, "features.bin"))
    graph.labels.tofile(os.path.join(d, "labels.bin"))
    meta = {
        "num_nodes": graph.num_nodes,
        "num_edges": graph.num_edges,
        "feature_dim": graph.feature_dim,
        "num_classes": graph.num_classes,
        "csum_indptr": _csum_int(graph.indptr),
        "csum_edges": _csum_int(graph.indices),
        "csum_features": _csum_float(graph.features),
        "csum_labels": _csum_int(graph.labels),
    }
    if graph.partition_map is not None:
        graph.partition_map.tofile(os.path.join(d, "partition_map.bin"))
        meta["csum_partition"] = _csum_int(graph.partition_map)
        meta["num_partitions"] = int(graph.partition_map.max()) + 1
    if graph.train_mask is not None:
        graph.train_mask.astype(np.uint8).tofile(os.path.join(d, "train_mask.bin"))
        graph.val_mask.astype(np.uint8).tofile(os.path.join(d, "val_mask.bin"))
        graph.test_mask.astype(np.uint8).tofile(os.path.join(d, "test_mask.bin"))
    with open(os.path.join(d, _META), "w") as fp:
        for k, v in meta.items():
            fp.write(f"{k}={v}\n")
    return d


def read_meta(root: str, name: str) -> dict:
    """Parse meta.txt (reference: utils.py:50-59)."""
    meta = {}
    with open(os.path.join(root, name, _META)) as fp:
        for line in fp:
            k, v = line.strip().split("=", 1)
            if k in ("num_nodes", "num_edges", "feature_dim", "num_classes",
                     "csum_indptr", "csum_edges", "csum_labels",
                     "csum_partition", "num_partitions"):
                meta[k] = int(v)
            elif k in ("csum_features",):
                meta[k] = float(v)
            else:
                meta[k] = v
    return meta


def load_graph(root: str, name: str, validate: bool = True,
               mmap_features: bool = False) -> Graph:
    """``mmap_features=True`` maps features.bin instead of reading it into
    RAM — required at papers100M scale (111M x 128 floats), where the
    cache layer's per-batch gathers touch only the rows it needs."""
    d = os.path.join(root, name)
    meta = read_meta(root, name)
    n, e = meta["num_nodes"], meta["num_edges"]
    indptr = np.fromfile(os.path.join(d, "indptr.bin"), dtype=np.int64)
    indices = np.fromfile(os.path.join(d, "indices.bin"), dtype=np.int64)
    if mmap_features:
        features = np.memmap(
            os.path.join(d, "features.bin"), dtype=np.float32, mode="r",
            shape=(n, meta["feature_dim"]),
        )
        validate_features = False
    else:
        features = np.fromfile(
            os.path.join(d, "features.bin"), dtype=np.float32
        ).reshape(n, meta["feature_dim"])
        validate_features = validate
    labels = np.fromfile(os.path.join(d, "labels.bin"), dtype=np.int32)
    if validate:
        assert indptr.shape[0] == n + 1, "indptr length mismatch"
        assert indices.shape[0] == e, "indices length mismatch"
        assert _csum_int(indptr) == meta["csum_indptr"], "indptr checksum"
        assert _csum_int(indices) == meta["csum_edges"], "edge checksum"
        assert _csum_int(labels) == meta["csum_labels"], "label checksum"
        if validate_features:
            got = _csum_float(features)
            assert abs(got - meta["csum_features"]) <= 1e-3 * max(
                1.0, abs(got)
            ), "feature checksum"
    g = Graph(
        indptr=indptr,
        indices=indices,
        features=features,
        labels=labels,
        num_classes=meta["num_classes"],
    )
    pm_path = os.path.join(d, "partition_map.bin")
    if os.path.exists(pm_path):
        pm = np.fromfile(pm_path, dtype=np.int32)
        if validate:
            assert _csum_int(pm) == meta["csum_partition"], "partition checksum"
        g.partition_map = pm
    tm_path = os.path.join(d, "train_mask.bin")
    if os.path.exists(tm_path):
        g.train_mask = np.fromfile(tm_path, dtype=np.uint8).astype(bool)
        g.val_mask = np.fromfile(os.path.join(d, "val_mask.bin"), dtype=np.uint8).astype(bool)
        g.test_mask = np.fromfile(os.path.join(d, "test_mask.bin"), dtype=np.uint8).astype(bool)
    return g
