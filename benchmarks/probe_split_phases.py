"""P=8 split-step phase breakdown on the virtual CPU mesh (VERDICT r2
item 6): how the sharded training step's time divides into aggregate vs
all_to_all shuffle vs linear/loss/opt.

Method: three jit'd variants of the SAME step, differenced —
  full        the production step (aggregate + shuffle_merge + linear)
  noshuffle   shuffle_merge skipped (partials merged locally only)
  noagg       aggregation replaced by a zeros frame (and no shuffle)
so  shuffle ~= full - noshuffle,  aggregate ~= noshuffle - noagg,
    linear+loss+opt ~= noagg.

CPU-mesh proportions are NOT TPU proportions (8 emulated devices share
the host cores; gather/scatter relative costs differ) — this is the
correctness-side profile of the multi-chip program this harness cannot
run on real chips, paired with bench.py's modeled ICI cost from measured
shuffle caps. Also records the MEASURED per-layer shuffle payload bytes
of the probed batch (valid push rows x H x 4, f32 partials).

    python -m benchmarks.probe_split_phases [--num-nodes 200000]
"""

from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-nodes", type=int, default=200000)
    ap.add_argument("--avg-degree", type=int, default=10)
    ap.add_argument("--feature-dim", type=int, default=128)
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--fan-out", type=str, default="10,10,25")
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from occ_gnn_tpu.data import random_graph
    from occ_gnn_tpu.models.common import linear
    from occ_gnn_tpu.parallel.model import SplitSAGE, make_split_train_step
    from occ_gnn_tpu.parallel.split import (
        aggregate,
        make_mesh,
        slice_owned,
    )
    from occ_gnn_tpu.sampling.slicer import (
        SplitSampler,
        measure_split_capacities,
    )
    from occ_gnn_tpu.training import gather_features

    P = 8
    fanouts = [int(f) for f in args.fan_out.split(",")]
    g = random_graph(num_nodes=args.num_nodes, avg_degree=args.avg_degree,
                     feature_dim=args.feature_dim, num_classes=47, seed=0)
    # round_robin: worst-case edge cut -> upper bound on shuffle volume.
    pmap = (np.arange(g.num_nodes) % P).astype(np.int32)
    caps = measure_split_capacities(g, g.train_nodes(), pmap, P, fanouts,
                                    args.batch_size, num_batches=2, seed=1)
    sampler = SplitSampler(g, g.train_nodes(), pmap, P, fanouts,
                           args.batch_size, capacities=caps, seed=2)
    batch = sampler.sample_batch(g.train_nodes()[: args.batch_size])
    xs = jnp.stack([
        gather_features(g.features, np.asarray(batch.input_nodes)[p])
        for p in range(P)
    ])

    # Measured shuffle payload of THIS batch (f32 partial-sum rows).
    dims = [g.feature_dim] + [args.hidden] * (len(fanouts) - 1)
    payload = [
        int((np.asarray(l.push_idx) >= 0).sum()) * h * 4
        for l, h in zip(batch.layers, dims)
    ]

    class NoShuffleSAGE(SplitSAGE):
        def layer(self, params, lyr, x):
            neigh = aggregate(x, lyr)
            self_x, neigh_mean, mask = slice_owned(neigh, lyr, x)
            h = linear(params, jnp.concatenate([self_x, neigh_mean], -1))
            return h * mask

    class NoAggSAGE(SplitSAGE):
        def layer(self, params, lyr, x):
            neigh = jnp.zeros((lyr.dst_cap, x.shape[-1]), jnp.float32)
            self_x, neigh_mean, mask = slice_owned(neigh, lyr, x)
            h = linear(params, jnp.concatenate([self_x, neigh_mean], -1))
            return h * mask

    mesh = make_mesh(P)
    opt = optax.adam(1e-3)
    times = {}
    for name, cls in (("full", SplitSAGE), ("noshuffle", NoShuffleSAGE),
                      ("noagg", NoAggSAGE)):
        model = cls(g.feature_dim, args.hidden, g.num_classes, len(fanouts))
        params = model.init(jax.random.PRNGKey(0))
        ost = opt.init(params)
        step = make_split_train_step(model, opt, mesh)
        params, ost, loss, _, _ = step(params, ost, batch, xs)  # compile
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            params, ost, loss, _, _ = step(params, ost, batch, xs)
        jax.block_until_ready(loss)
        times[name] = (time.perf_counter() - t0) / args.reps

    shuffle_s = max(times["full"] - times["noshuffle"], 0.0)
    agg_s = max(times["noshuffle"] - times["noagg"], 0.0)
    rec = {
        "experiment": "split_phases",
        "time": time.time(),
        "P": P,
        "graph": f"random-{g.num_nodes}",
        "batch_size": args.batch_size,
        "fanouts": fanouts,
        "hidden": args.hidden,
        "full_step_s": round(times["full"], 4),
        "aggregate_s": round(agg_s, 4),
        "shuffle_s": round(shuffle_s, 4),
        "linear_loss_opt_s": round(times["noagg"], 4),
        "shuffle_payload_bytes_per_layer": payload,
        "partition": "round_robin (worst-case cut)",
        "note": "CPU-mesh differencing profile — device-time proportions "
                "are not TPU proportions; see bench.py ici_model_* for the "
                "measured-caps ICI model",
    }
    os.makedirs(os.path.join(os.path.dirname(__file__), "results"),
                exist_ok=True)
    with open(os.path.join(os.path.dirname(__file__), "results",
                           "split_phases.jsonl"), "a") as fp:
        fp.write(json.dumps(rec) + "\n")
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
