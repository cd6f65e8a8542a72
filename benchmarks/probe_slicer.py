"""Host slicer throughput probe: ns/edge of the C++ sample+slice service.

VERDICT r2 flagged the host slicer as unprofiled (~520 ns/edge at products
scale) and named the per-batch ``std::vector`` allocations in
``Worker::slice_layer`` as the optimization target (reference lesson:
slicing dominates the pipeline, /root/reference/experiments/exp5/exp5.txt:8).
This probe isolates the C++ phase timers (occ_stats) from everything else:
no device, no feature gathers — just the service, one worker, the
production cache policy, products-like config.

Env:
  OCC_PROBE_NODES    graph size (default 1,000,000; 2,450,000 = products)
  OCC_PROBE_BATCHES  batches to time (default 8)
  OCC_PROBE_WORKERS  worker threads (default 1 — per-worker throughput)

Appends one JSON record to benchmarks/results/slicer_opt.jsonl.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Host-only probe: never touch the (possibly tunneled) TPU. The hosting
# env may pin JAX_PLATFORMS to a plugin — override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"


def main():
    from occ_gnn_tpu.cache import CachePlan
    from occ_gnn_tpu.data import random_graph
    from occ_gnn_tpu.sampling.native import NativeSplitSampler
    from occ_gnn_tpu.sampling.slicer import (
        measure_split_capacities,
        plan_split_capacities,
    )

    num_nodes = int(os.environ.get("OCC_PROBE_NODES", 1_000_000))
    nbatches = int(os.environ.get("OCC_PROBE_BATCHES", 8))
    workers = int(os.environ.get("OCC_PROBE_WORKERS", 1))
    fanouts = [10, 10, 25]
    batch_size = 1024
    P = 1

    t0 = time.perf_counter()
    g = random_graph(num_nodes=num_nodes, avg_degree=25, feature_dim=8,
                     num_classes=47, seed=0)
    build_s = time.perf_counter() - t0
    pmap = np.zeros(g.num_nodes, dtype=np.int32)

    safe = plan_split_capacities(batch_size, fanouts, g.num_nodes, P)
    probe = CachePlan(g, pmap, P, 0.25, refresh_cap=safe["frame_caps"][0])
    caps = measure_split_capacities(
        g, g.train_nodes(), pmap, P, fanouts, batch_size, num_batches=3,
        margin=1.5, seed=1, cache_plan=probe,
    )
    plan = CachePlan(g, pmap, P, 0.25,
                     refresh_cap=max(caps.pop("refresh_cap", 8), 8))
    sampler = NativeSplitSampler(
        g, g.train_nodes(), pmap, P, fanouts, batch_size,
        capacities=caps, seed=0, cache=plan, num_workers=workers,
        drop_last=True, packed=True,
    )

    # Warm one batch (first-touch page faults, jit of unpack), reset stats
    # by reading a baseline snapshot.
    it = iter(sampler)
    next(it)
    base = sampler.stats()

    edges = 0
    t0 = time.perf_counter()
    for _ in range(nbatches):
        b = next(it)
        edges += sum(
            int((np.asarray(l.edge_dst) < l.dst_cap).sum())
            for l in b.layers
        )
    wall = time.perf_counter() - t0
    st = sampler.stats()
    sampler.close()

    n = st["samples"] - base["samples"]
    sample_s = (st["sample_s_total"] - base["sample_s_total"]) / n
    slice_s = (st["slice_s_total"] - base["slice_s_total"]) / n
    epb = edges / nbatches
    rec = {
        "experiment": "slicer_opt",
        "nodes": num_nodes,
        "workers": workers,
        "batches": nbatches,
        "edges_per_batch": int(epb),
        "cxx_sample_ms": round(sample_s * 1e3, 1),
        "cxx_slice_ms": round(slice_s * 1e3, 1),
        "sample_ns_per_edge": round(sample_s / epb * 1e9, 1),
        "slice_ns_per_edge": round(slice_s / epb * 1e9, 1),
        "wall_s_per_batch": round(wall / nbatches, 4),
        "graph_build_s": round(build_s, 1),
    }
    print(json.dumps(rec))
    out = os.path.join(os.path.dirname(__file__), "results",
                       "slicer_opt.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
