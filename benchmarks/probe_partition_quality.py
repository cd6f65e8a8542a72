"""Partition-quality probe: multilevel (csrc/partition.cpp) vs LDG vs
round-robin, with the DOWNSTREAM split-parallel deltas (VERDICT r4 item 4:
"measured edge-cut vs LDG/rr on the products-scale synthetic ... plus the
downstream delta in shuffle rows").

For each partitioner and graph family (community-structured block graph
and a structureless random graph, both at the bench's products scale by
default) this measures:
  * edge-cut fraction + partition wall time + degree-weighted balance;
  * downstream per-batch shuffle rows and modeled f32 payload bytes at
    P=8 for the flagship config (fanout [10,10,25], batch 1024), from
    real sliced batches (sum over layers of rows actually pushed).

Run:  python -m benchmarks.probe_partition_quality [--nodes N]
Appends to benchmarks/results/partition_quality.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

RESULTS = os.path.join(os.path.dirname(__file__), "results",
                       "partition_quality.jsonl")


def shuffle_rows_per_batch(g, pmap, P, fanouts, batch_size, hidden, seed=3,
                           num_batches=2):
    """Real sliced batches: valid push rows per layer (the all_to_all
    payload), averaged over batches."""
    from occ_gnn_tpu.sampling.slicer import SplitSampler

    s = SplitSampler(g, g.train_nodes(), pmap, P, fanouts, batch_size,
                     seed=seed)
    it = iter(s)
    dims = [g.feature_dim] + [hidden] * (len(fanouts) - 1)
    rows = np.zeros(len(fanouts))
    n = 0
    for b in it:
        for l, lyr in enumerate(b.layers):
            rows[l] += int((np.asarray(lyr.push_idx) >= 0).sum())
        n += 1
        if n >= num_batches:
            break
    rows /= max(n, 1)
    payload = float(sum(r * h * 4 for r, h in zip(rows, dims)))
    return [float(r) for r in rows], payload


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from occ_gnn_tpu.data import block_graph, random_graph
    from occ_gnn_tpu.data.partition import (
        _ldg_partition,
        _multilevel_partition,
        edge_cut_fraction,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=2_450_000)
    ap.add_argument("--avg-degree", type=int, default=25)
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--skip-downstream", action="store_true")
    args = ap.parse_args()

    P = args.partitions
    fanouts = [10, 10, 25]
    batch_size = 1024
    hidden = 128

    graphs = [
        ("community", block_graph(
            num_nodes=args.nodes, num_blocks=64,
            avg_degree=args.avg_degree, feature_dim=32, seed=0)),
        ("random", random_graph(
            num_nodes=args.nodes, avg_degree=args.avg_degree,
            feature_dim=32, seed=0)),
    ]
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    for gname, g in graphs:
        w = g.in_degrees() + g.out_degrees() + 1
        modes = {}
        t0 = time.perf_counter()
        modes["multilevel"] = (_multilevel_partition(g, P, seed=1),
                               time.perf_counter() - t0)
        t0 = time.perf_counter()
        modes["ldg"] = (_ldg_partition(g, P), time.perf_counter() - t0)
        modes["round_robin"] = (
            (np.arange(g.num_nodes) % P).astype(np.int32), 0.0)
        for mode, (pmap, dt) in modes.items():
            rec = {
                "bench": "partition_quality",
                "graph": gname,
                "num_nodes": g.num_nodes,
                "num_edges": g.num_edges,
                "partitions": P,
                "mode": mode,
                "edge_cut": round(edge_cut_fraction(g, pmap), 4),
                "partition_s": round(dt, 2),
                "balance": round(float(
                    np.bincount(pmap, weights=w, minlength=P).max()
                    / (w.sum() / P)), 3),
            }
            if not args.skip_downstream:
                rows, payload = shuffle_rows_per_batch(
                    g, pmap, P, fanouts, batch_size, hidden)
                rec["shuffle_rows_per_layer"] = [round(r, 1) for r in rows]
                rec["shuffle_payload_mb_per_batch"] = round(payload / 1e6, 2)
            print(json.dumps(rec))
            with open(RESULTS, "a") as fp:
                fp.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
