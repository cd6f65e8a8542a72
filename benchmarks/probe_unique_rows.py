"""Two-level (unique-row) aggregation study — VERDICT r3 weak #4.

The question: dense fanout-K aggregation issues ~one HBM row transaction
per sampled EDGE (K gathers per dst), while the deduped src frame holds
several times fewer UNIQUE rows. Could a two-level scheme — per dst
tile, gather the tile's unique frame rows once into VMEM, then
aggregate via a one-hot MXU matmul (the substrate of
ops/pallas_spmm_blocked.py) — beat the per-edge gather?

The answer hinges on WHERE the reuse lives. This probe measures, from
REAL sliced batches at bench shapes:

  1. batch-level reuse: edges / unique-frame-rows (the ~5x figure the
     frame dedup achieves ACROSS the whole batch);
  2. WITHIN-TILE reuse: for dst tiles of size T, the per-tile unique
     src count U_t among the tile's T*K edge slots. Only within-tile
     reuse is exploitable by a VMEM-staged two-level kernel (the whole
     frame exceeds VMEM by ~2x at products scale);
  3. the implied trade at chip constants: row transactions saved
     (T*K - U_t per tile at ~6.4 ns/row, the measured XLA gather rate)
     vs one-hot MXU flops added (2*T*U_t*H per tile at peak bf16),
     plus the unavoidable U_t-row gather.

Run:  python -m benchmarks.probe_unique_rows [--nodes N] [--power-law A]
Appends a record to benchmarks/results/unique_rows.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

RESULTS = os.path.join(os.path.dirname(__file__), "results",
                       "unique_rows.jsonl")

ROW_NS = 6.4          # measured XLA random-row gather ns/row (r2 probe)
PEAK_FLOPS = 197e12   # v5e bf16
MXU_EFF = 0.5         # optimistic sustained fraction for the one-hot dots


def analyze_layer(nbr: np.ndarray, sentinel: int, hidden: int,
                  tiles=(256, 1024, 4096, 16384)):
    """nbr: [K, D] src frame rows (sentinel = padding)."""
    K, D = nbr.shape
    valid = nbr != sentinel
    edges = int(valid.sum())
    uniq_batch = np.unique(nbr[valid])
    out = {
        "K_cap": K,
        "D_cap": D,
        "edges": edges,
        "unique_rows_batch": int(uniq_batch.shape[0]),
        "edges_per_unique_batch": round(edges / max(uniq_batch.shape[0], 1), 2),
        "tiles": [],
    }
    for T in tiles:
        nt = -(-D // T)
        u_sum = 0
        e_sum = 0
        mxu_flops = 0.0
        for t in range(nt):
            blk = nbr[:, t * T : (t + 1) * T]
            v = blk != sentinel
            e_t = int(v.sum())
            u_t = int(np.unique(blk[v]).shape[0]) if e_t else 0
            u_sum += u_t
            e_sum += e_t
            # one-hot dot per tile: [T, U_t] x [U_t, H]
            mxu_flops += 2.0 * min(T, D - t * T) * u_t * hidden
        base_ns = e_sum * ROW_NS
        two_level_ns = u_sum * ROW_NS + mxu_flops / (PEAK_FLOPS * MXU_EFF) * 1e9
        out["tiles"].append({
            "tile": T,
            "edges": e_sum,
            "unique_rows_in_tiles": u_sum,
            "within_tile_reuse": round(e_sum / max(u_sum, 1), 3),
            "baseline_gather_ms": round(base_ns / 1e6, 2),
            "two_level_gather_ms": round(u_sum * ROW_NS / 1e6, 2),
            "two_level_onehot_ms_at_50pct_mxu": round(
                mxu_flops / (PEAK_FLOPS * MXU_EFF) * 1e3, 2
            ),
            "two_level_total_ms": round(two_level_ns / 1e6, 2),
            "speedup": round(base_ns / max(two_level_ns, 1e-9), 3),
        })
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=2_450_000)
    ap.add_argument("--avg-degree", type=int, default=25)
    ap.add_argument("--power-law", type=float, default=None,
                    help="degree skew exponent (None = uniform, the bench "
                         "default graph)")
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--fan-out", default="10,10,25")
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--num-batches", type=int, default=2)
    args = ap.parse_args()

    from occ_gnn_tpu.cache import CachePlan
    from occ_gnn_tpu.data import random_graph
    from occ_gnn_tpu.sampling.native import NativeSplitSampler
    from occ_gnn_tpu.sampling.slicer import (
        measure_split_capacities,
        plan_split_capacities,
    )

    fanouts = [int(f) for f in args.fan_out.split(",")]
    kw = {}
    if args.power_law is not None:
        kw["power_law"] = args.power_law
    t0 = time.time()
    g = random_graph(num_nodes=args.nodes, avg_degree=args.avg_degree,
                     feature_dim=8, num_classes=47, seed=0, **kw)
    pmap = np.zeros(g.num_nodes, dtype=np.int32)
    safe = plan_split_capacities(args.batch_size, fanouts, g.num_nodes, 1)
    probe = CachePlan(g, pmap, 1, 0.25, refresh_cap=safe["frame_caps"][0])
    caps = measure_split_capacities(
        g, g.train_nodes(), pmap, 1, fanouts, args.batch_size,
        num_batches=2, margin=1.5, seed=1, cache_plan=probe,
    )
    plan = CachePlan(g, pmap, 1, 0.25,
                     refresh_cap=max(caps.pop("refresh_cap", 8), 8))
    s = NativeSplitSampler(g, g.train_nodes(), pmap, 1, fanouts,
                           args.batch_size, capacities=caps, seed=0,
                           cache=plan, num_workers=1)
    print(f"setup {time.time() - t0:.0f}s", flush=True)

    layer_stats = []
    it = iter(s)
    for b in range(args.num_batches):
        batch = next(it)
        for l, lyr in enumerate(batch.layers):
            nbr = np.asarray(lyr.nbr_idx)[0]  # [K, D]
            st = analyze_layer(nbr, lyr.src_cap - 1, args.hidden)
            st["layer"] = l
            st["batch"] = b
            layer_stats.append(st)
            print(json.dumps(st), flush=True)
    s.close()

    rec = {
        "probe": "unique_rows",
        "time": time.time(),
        "graph": f"{args.nodes}n/{g.num_edges}e"
                 + (f"/power_law={args.power_law}"
                    if args.power_law is not None else "/uniform"),
        "fanouts": fanouts,
        "batch_size": args.batch_size,
        "hidden": args.hidden,
        "model_constants": {"row_ns": ROW_NS, "peak_flops": PEAK_FLOPS,
                            "mxu_eff": MXU_EFF},
        "layers": layer_stats,
    }
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    with open(RESULTS, "a") as fp:
        fp.write(json.dumps(rec) + "\n")
    print(f"recorded -> {RESULTS}")


if __name__ == "__main__":
    main()
