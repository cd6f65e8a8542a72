"""Static graph partitioning (node -> partition id).

The reference uses METIS with degree-based vertex weights
(/root/reference/python/utils/metis.py:8-88) plus naive round-robin
(/root/reference/cslicer/pyfrontend.cpp:56-65) and random modes
(/root/reference/src/gnn/dist_sage.cu:18-50). Here:

  * ``round_robin`` / ``random``: same semantics as the reference modes.
  * ``greedy``: weighted Linear Deterministic Greedy (LDG) streaming
    partitioner over nodes in high-degree-first order — a one-pass
    baseline that minimizes edge cut under a balance constraint.
  * ``metis``: real multilevel partitioning — the in-repo C++
    coarsen/partition/refine implementation (csrc/partition.cpp: heavy-
    edge matching + greedy growth + KL/FM-style boundary refinement,
    degree vertex weights like the reference's gpmetis call,
    metis.py:22-41). ``gpmetis`` is used instead when present on PATH
    (it never is in this environment); the Python LDG is the last-resort
    fallback if the C++ library cannot build.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import numpy as np

from occ_gnn_tpu.data.graph import Graph


def partition_graph(
    graph: Graph,
    num_partitions: int,
    mode: str = "greedy",
    seed: int = 0,
    attach: bool = True,
) -> np.ndarray:
    if mode == "round_robin":
        pmap = (np.arange(graph.num_nodes) % num_partitions).astype(np.int32)
    elif mode == "random":
        rng = np.random.default_rng(seed)
        pmap = rng.integers(0, num_partitions, size=graph.num_nodes).astype(np.int32)
    elif mode == "greedy":
        pmap = _ldg_partition(graph, num_partitions)
    elif mode == "metis":
        if shutil.which("gpmetis"):
            pmap = _gpmetis_partition(graph, num_partitions)
        else:
            try:
                pmap = _multilevel_partition(graph, num_partitions,
                                             seed=seed)
            except Exception:
                pmap = _ldg_partition(graph, num_partitions)
    else:
        raise ValueError(f"unknown partition mode: {mode}")
    if attach:
        graph.partition_map = pmap
    return pmap


def edge_cut_fraction(graph: Graph, pmap: np.ndarray) -> float:
    """Fraction of edges whose endpoints live in different partitions."""
    dst = np.repeat(np.arange(graph.num_nodes), graph.in_degrees())
    cut = pmap[graph.indices] != pmap[dst]
    return float(np.mean(cut)) if cut.size else 0.0


def _ldg_partition(graph: Graph, k: int) -> np.ndarray:
    """Weighted LDG streaming partitioner, high-degree nodes first.

    score(p) = |neighbors already in p| * (1 - load_p / capacity); node
    weight is degree+1 so partitions balance total work, matching the
    reference's degree-weighted METIS objective (metis.py:22-41).
    """
    n = graph.num_nodes
    deg_in = graph.in_degrees()
    deg_out = graph.out_degrees()
    weight = (deg_in + deg_out + 1).astype(np.float64)
    capacity = weight.sum() / k * 1.05
    order = np.argsort(-(deg_in + deg_out), kind="stable")
    pmap = np.full(n, -1, dtype=np.int32)
    load = np.zeros(k, dtype=np.float64)
    indptr, indices = graph.indptr, graph.indices
    # Out-neighbor CSR so both edge directions vote.
    dst_of_edge = np.repeat(np.arange(n), deg_in)
    out_order = np.argsort(indices, kind="stable")
    out_indices = dst_of_edge[out_order]
    out_indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(out_indptr, indices + 1, 1)
    out_indptr = np.cumsum(out_indptr)

    counts = np.zeros(k, dtype=np.float64)
    for v in order:
        counts[:] = 0.0
        for nb in indices[indptr[v]:indptr[v + 1]]:
            p = pmap[nb]
            if p >= 0:
                counts[p] += 1.0
        for nb in out_indices[out_indptr[v]:out_indptr[v + 1]]:
            p = pmap[nb]
            if p >= 0:
                counts[p] += 1.0
        score = counts * np.maximum(1.0 - load / capacity, 0.0)
        if score.max() <= 0.0:
            p_best = int(np.argmin(load))
        else:
            p_best = int(np.argmax(score))
        pmap[v] = p_best
        load[p_best] += weight[v]
    return pmap


_PART_LIB = None


def _load_partition_lib():
    """Build + load the C++ multilevel partitioner (csrc/partition.cpp)."""
    global _PART_LIB
    if _PART_LIB is not None:
        return _PART_LIB
    import ctypes
    import subprocess

    csrc = os.path.join(os.path.dirname(__file__), "..", "csrc")
    lib_path = os.path.join(csrc, "libocc_partition.so")
    src = os.path.join(csrc, "partition.cpp")
    if (not os.path.exists(lib_path)
            or os.path.getmtime(lib_path) < os.path.getmtime(src)):
        subprocess.run(["make", "-s", "libocc_partition.so"], cwd=csrc,
                       check=True)
    lib = ctypes.CDLL(lib_path)
    lib.occ_metis_partition.restype = ctypes.c_int32
    lib.occ_metis_partition.argtypes = [
        ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_uint64, ctypes.c_double, ctypes.c_void_p,
    ]
    _PART_LIB = lib
    return lib


def _multilevel_partition(graph: Graph, k: int, seed: int = 0,
                          imbalance: float = 1.05) -> np.ndarray:
    """Multilevel coarsen/partition/refine (C++; see csrc/partition.cpp)."""
    lib = _load_partition_lib()
    indptr = np.ascontiguousarray(graph.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(graph.indices, dtype=np.int64)
    out = np.empty(graph.num_nodes, dtype=np.int32)
    rc = lib.occ_metis_partition(
        graph.num_nodes, indptr.ctypes.data, indices.ctypes.data, k,
        seed + 1, imbalance, out.ctypes.data,
    )
    assert rc == 0
    return out


def _gpmetis_partition(graph: Graph, k: int) -> np.ndarray:
    """Write the METIS input format with degree vertex weights, run gpmetis
    (reference: metis.py:43-88), parse the .part file."""
    n = graph.num_nodes
    deg = graph.in_degrees()
    # METIS wants an undirected adjacency without self loops, 1-indexed.
    dst = np.repeat(np.arange(n), deg)
    src = graph.indices
    und = np.concatenate([np.stack([src, dst]), np.stack([dst, src])], axis=1)
    und = und[:, und[0] != und[1]]
    order = np.lexsort((und[1], und[0]))
    und = und[:, order]
    keep = np.ones(und.shape[1], dtype=bool)
    keep[1:] = (und[0, 1:] != und[0, :-1]) | (und[1, 1:] != und[1, :-1])
    und = und[:, keep]
    counts = np.bincount(und[0], minlength=n)
    starts = np.concatenate([[0], np.cumsum(counts)])
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "graph.metis")
        with open(path, "w") as fp:
            fp.write(f"{n} {und.shape[1] // 2} 010\n")
            for v in range(n):
                nbrs = und[1, starts[v]:starts[v + 1]] + 1
                fp.write(f"{deg[v] + 1} " + " ".join(map(str, nbrs)) + "\n")
        subprocess.run(["gpmetis", path, str(k)], check=True, capture_output=True)
        part = np.loadtxt(f"{path}.part.{k}", dtype=np.int32)
    return part
