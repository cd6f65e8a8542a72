"""papers100M-scale viability run: slicer + compact cache maps at N >= 100M.

The reference's largest dataset is ogbn-papers100M (111M nodes / 1.6B
edges, /root/reference/experiments/exp6/exp6.txt:14). This script proves
the data path holds at that node count on one host:

  * synthetic CSR graph at --num-nodes (default 100M) with uniform random
    in-neighbors (--avg-degree per node),
  * features memory-mapped on disk (the papers100M ingest mode,
    data/graph.py memmap support) — never resident in RAM,
  * CachePlan with COMPACT maps (owner_local[N] int32 + per-partition
    foreign arrays — the dense [N, P] maps of round 1 were ~16 GB at this
    scale and are gone),
  * the C++ sampling+slicing service (NativeSplitSampler) pulling real
    batches; throughput recorded as sampled edges/s per worker.

Writes one JSON record to benchmarks/results/scale100m.jsonl.

Usage:
    python benchmarks/scale100m.py                  # full 100M run
    python benchmarks/scale100m.py --num-nodes 2_000_000   # quick check
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_graph(n: int, avg_degree: int, feature_dim: int, workdir: str,
                seed: int = 0):
    from occ_gnn_tpu.data.graph import Graph

    rng = np.random.default_rng(seed)
    deg = np.full(n, avg_degree, dtype=np.int64)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(deg, out=indptr[1:])
    e = int(indptr[-1])
    # uniform random sources, generated in chunks to bound peak RSS
    indices = np.empty(e, dtype=np.int64)
    chunk = 100_000_000
    for lo in range(0, e, chunk):
        hi = min(lo + chunk, e)
        indices[lo:hi] = rng.integers(0, n, hi - lo, dtype=np.int64)
    os.makedirs(workdir, exist_ok=True)
    feat_path = os.path.join(workdir, "features.bin")
    feats = np.memmap(feat_path, dtype=np.float32, mode="w+",
                      shape=(n, feature_dim))
    # fill a small prefix so gathered rows are non-trivial; the rest stays
    # a sparse file (zeros) — content is irrelevant to slicer throughput
    feats[:10_000] = rng.standard_normal((10_000, feature_dim)).astype(
        np.float32
    )
    labels = np.zeros(n, dtype=np.int32)
    return Graph(indptr=indptr, indices=indices, features=feats,
                 labels=labels, num_classes=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-nodes", type=int, default=100_000_000)
    ap.add_argument("--avg-degree", type=int, default=8)
    ap.add_argument("--feature-dim", type=int, default=16)
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--fan-out", type=str, default="10,10,25")
    ap.add_argument("--cache-per", type=str, default="0.05",
                    help="fraction, or 'auto' to size to the HBM budget "
                         "(at 100M x 16-dim the whole bf16 table fits -> "
                         "replicated cache, no refresh)")
    ap.add_argument("--innermost", type=str, default="auto",
                    choices=["auto", "host", "device"],
                    help="device = sample the innermost layer on-chip "
                         "from a resident CSR (needs --device-step and a "
                         "replicated cache)")
    ap.add_argument("--num-batches", type=int, default=16)
    ap.add_argument("--num-workers", type=int, default=2)
    ap.add_argument("--workdir", type=str, default="/tmp/occ_scale100m")
    ap.add_argument("--seed", type=int, default=0)
    # --device-step: run the jit'd split TRAINING STEP on the real chip
    # over the native service's batches at this node count (VERDICT r2
    # item 4 — round 2 stopped before the device): builds bf16 cache
    # frames (static top-k + per-batch refresh tail), records step_ms,
    # refresh bytes, and the HBM frame footprint. Use --partitions 1 on
    # the single-chip harness.
    ap.add_argument("--device-step", action="store_true")
    ap.add_argument("--hidden", type=int, default=128)
    args = ap.parse_args()

    import jax

    if not args.device_step or os.environ.get("OCC_FORCE_CPU") == "1":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from occ_gnn_tpu.cache import CachePlan
    from occ_gnn_tpu.sampling.native import NativeSplitSampler
    from occ_gnn_tpu.sampling.slicer import (
        measure_split_capacities,
        scale_capacities,
    )

    fanouts = [int(f) for f in args.fan_out.split(",")]
    P = args.partitions
    record = {"bench": "scale100m", "num_nodes": args.num_nodes,
              "avg_degree": args.avg_degree, "partitions": P,
              "batch_size": args.batch_size, "fanouts": fanouts,
              "cache_per": args.cache_per}  # resolved value recorded below

    t0 = time.perf_counter()
    g = build_graph(args.num_nodes, args.avg_degree, args.feature_dim,
                    args.workdir, args.seed)
    record["build_graph_s"] = round(time.perf_counter() - t0, 2)
    print(f"graph: {g.num_nodes:,} nodes / {g.num_edges:,} edges "
          f"({record['build_graph_s']}s)", flush=True)

    t0 = time.perf_counter()
    pmap = (np.arange(g.num_nodes, dtype=np.int32) % P)  # round-robin
    record["partition_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    # generous refresh budget: every deepest-frame node could miss
    probe_caps = measure_split_capacities(
        g, np.arange(0, g.num_nodes, max(g.num_nodes // 100_000, 1)),
        pmap, P, fanouts, args.batch_size, num_batches=3, margin=1.3,
        seed=args.seed,
    )
    refresh_cap = probe_caps["frame_caps"][0]
    record["measure_caps_s"] = round(time.perf_counter() - t0, 2)
    record["caps"] = {k: v for k, v in probe_caps.items()}

    from occ_gnn_tpu.cache import resolve_cache_percentage

    cache_pct = resolve_cache_percentage(
        args.cache_per, g, pmap, P, dtype_bytes=2, refresh_cap=refresh_cap,
    )
    record["cache_per"] = round(cache_pct, 4)
    t0 = time.perf_counter()
    plan = CachePlan(g, pmap, P, cache_pct, refresh_cap=refresh_cap)
    record["cache_plan_s"] = round(time.perf_counter() - t0, 2)
    map_bytes = (plan.owner_local.nbytes + plan.static_owner_local.nbytes
                 + plan.wmap.nbytes + plan.foreign_nodes_flat.nbytes
                 + plan.foreign_local_flat.nbytes)
    record["cache_map_bytes"] = int(map_bytes)
    dense_bytes = g.num_nodes * P * (1 + 8)  # round-1 dense [N,P] maps
    record["dense_map_bytes_avoided"] = int(dense_bytes)
    print(f"cache maps: {map_bytes/1e9:.2f} GB compact vs "
          f"{dense_bytes/1e9:.2f} GB dense ({record['cache_plan_s']}s)",
          flush=True)

    caps = dict(probe_caps)
    caps.pop("refresh_cap", None)
    train_nodes = np.random.default_rng(args.seed).choice(
        g.num_nodes, size=args.batch_size * (args.num_batches + 2),
        replace=False,
    )
    from occ_gnn_tpu.parallel.split import count_layer_edges

    cache = plan
    if args.device_step:
        import jax.numpy as jnp

        from occ_gnn_tpu.cache import SplitFeatureCache

        cache = SplitFeatureCache(plan, dtype=jnp.bfloat16)
        record["frame_hbm_gb"] = round(
            P * plan.frame_cap * g.feature_dim * 2 / 1e9, 3
        )
        record["refresh_bytes_cap"] = int(
            P * plan.refresh_cap * g.feature_dim * 2
        )  # worst case; measured avg lands in refresh_bytes_per_batch
    innermost = args.innermost
    if innermost == "auto":
        innermost = ("device" if (args.device_step and plan.replicated
                                  and g.num_edges < 2**31) else "host")
    record["innermost"] = innermost
    sampler = NativeSplitSampler(
        g, train_nodes, pmap, P, fanouts, args.batch_size,
        capacities=caps, seed=args.seed, cache=cache,
        num_workers=args.num_workers, innermost=innermost,
    )
    try:
        if args.device_step:
            import optax

            from occ_gnn_tpu.parallel.model import (
                SplitSAGE,
                make_split_train_step,
            )
            from occ_gnn_tpu.parallel.split import make_mesh
            import jax.numpy as jnp

            mesh = make_mesh(P)
            model = SplitSAGE(g.feature_dim, args.hidden, g.num_classes,
                              len(fanouts), dtype=jnp.bfloat16)
            params = model.init(jax.random.PRNGKey(0))
            opt = optax.adam(1e-3)
            ost = opt.init(params)
            csr = None
            skey = [None]
            if innermost == "device":
                from occ_gnn_tpu.parallel.model import make_device_csr

                csr = make_device_csr(g)
                record["csr_hbm_gb"] = round(
                    (csr[0].nbytes + csr[1].nbytes) / 1e9, 2
                )
                skey = [jax.random.PRNGKey(17), 0]
            step0 = make_split_train_step(model, opt, mesh, csr=csr)

            def step(params, ost, batch, frames):
                if csr is None:
                    return step0(params, ost, batch, frames)
                skey[1] += 1
                return step0(params, ost, batch, frames,
                             sample_rng=jax.random.fold_in(
                                 skey[0], skey[1]))
            it = iter(sampler)
            # Phase A: stage batches with their frames version (each
            # refresh is a functional update — pairing stays correct).
            nstage = min(args.num_batches, 8)  # 8 frame versions in HBM
            staged = []
            n_edges = 0
            indeg = (np.diff(np.asarray(g.indptr))
                     if innermost == "device" else None)
            for _ in range(nstage):
                batch = next(it)
                staged.append((batch, cache.frames))
                for lyr in batch.layers:
                    if lyr.device_sampled:
                        dg = np.asarray(lyr.dst_global).ravel()
                        dg = dg[dg >= 0]
                        n_edges += int(
                            np.minimum(indeg[dg], lyr.fanout).sum()
                            + dg.shape[0]
                        )
                    else:
                        n_edges += count_layer_edges(lyr)
            b0, f0 = staged[0]  # warmup: compile step + unpack
            params, ost, loss, _, _ = step(params, ost, b0, f0)
            _ = float(loss)  # device->host fetch: the tunnel-safe sync
            # Phase B: timed step loop over device-ready batches.
            t0 = time.perf_counter()
            for batch, frames in staged:
                params, ost, loss, _, _ = step(params, ost, batch, frames)
            lv = float(loss)
            step_wall = time.perf_counter() - t0
            # Phase C: overlapped pipeline (host sample+slice+tail feed
            # the step concurrently), wall-clocked end to end.
            n_pipe = 0
            t0 = time.perf_counter()
            for batch in it:
                params, ost, loss, _, _ = step(params, ost, batch,
                                               cache.frames)
                n_pipe += 1
                if n_pipe >= args.num_batches:
                    break
            _ = float(loss)
            wall = time.perf_counter() - t0
            st = sampler.stats()
            record["device_step_ms"] = round(step_wall / nstage * 1e3, 2)
            record["device_loss"] = round(lv, 4)
            record["pipelined_wall_s_per_batch"] = round(
                wall / max(n_pipe, 1), 3
            )
            record["platform"] = jax.devices()[0].platform
            record["storage_dtype"] = "bfloat16"
            record["refresh_bytes_per_batch"] = int(
                cache.tail_bytes_total / max(cache.tail_batches, 1)
            )
            record["arena_bytes_per_batch"] = int(
                getattr(sampler, "_arena_words", 0) * 4
            )
            record["edges_per_batch"] = n_edges // nstage
            # edges_sliced / edges_per_s_wall below describe the PIPELINED
            # phase (wall covers n_pipe overlapped batches).
            n_edges = (n_edges // nstage) * max(n_pipe, 1)
        else:
            # warmup (jit the unpack) then timed pulls
            it = iter(sampler)
            next(it)
            t0 = time.perf_counter()
            n_edges = 0
            for i, batch in enumerate(it):
                for lyr in batch.layers:
                    n_edges += count_layer_edges(lyr)
                if i + 1 >= args.num_batches:
                    break
            wall = time.perf_counter() - t0
            st = sampler.stats()
    finally:
        sampler.close()

    record["batches_timed"] = args.num_batches
    record["wall_s"] = round(wall, 3)
    record["edges_sliced"] = int(n_edges)
    record["edges_per_s_wall"] = round(n_edges / wall, 1)
    record["sample_s_per_batch"] = round(st["sample_s_per_batch"], 4)
    record["slice_s_per_batch"] = round(st["slice_s_per_batch"], 4)
    record["peak_rss_gb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2
    )
    print(json.dumps(record), flush=True)
    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/scale100m.jsonl", "a") as f:
        f.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
