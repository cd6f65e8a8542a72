"""Experiment harness — the analog of the reference's experiments/exp1..6
(/root/reference/experiments/): each experiment prints a markdown table and
appends a JSON record to benchmarks/results/.

    python -m benchmarks.experiments exp1 [--cpu] ...   sampling/slicing cost
    python -m benchmarks.experiments exp2 ...           full-graph partitioned aggregation
    python -m benchmarks.experiments exp5 ...           pipeline overlap
    python -m benchmarks.experiments exp3 ...           cache sweep
    python -m benchmarks.experiments exp4 ...           split-benefit analytics
    python -m benchmarks.experiments exp6 ...           OCC vs baselines phases

Unlike the reference (which shells out to training scripts and regex-scrapes
stdout, exp6/occ.py:12-29), experiments call the framework directly and emit
structured JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

RESULTS_DIR = os.path.join(os.path.dirname(__file__), "results")


def _record(name: str, payload: dict):
    os.makedirs(RESULTS_DIR, exist_ok=True)
    payload = {"experiment": name, "time": time.time(), **payload}
    with open(os.path.join(RESULTS_DIR, f"{name}.jsonl"), "a") as fp:
        fp.write(json.dumps(payload) + "\n")
    return payload


def _test_graph(args):
    from occ_gnn_tpu.data import random_graph

    return random_graph(
        num_nodes=args.num_nodes,
        avg_degree=args.avg_degree,
        feature_dim=args.feature_dim,
        num_classes=32,
        seed=0,
    )


def exp1(args):
    """Sampling + slicing cost: numpy reference vs C++ service
    (reference exp1 compared DGL-CPU vs custom samplers)."""
    from occ_gnn_tpu.data import partition_graph
    from occ_gnn_tpu.sampling.native import NativeSplitSampler
    from occ_gnn_tpu.sampling.slicer import SplitSampler, measure_split_capacities

    g = _test_graph(args)
    pmap = partition_graph(g, args.partitions, mode="greedy")
    fanouts = [int(f) for f in args.fan_out.split(",")]
    caps = measure_split_capacities(g, g.train_nodes(), pmap,
                                    args.partitions, fanouts,
                                    args.batch_size, num_batches=2)
    nodes = g.train_nodes()[: args.batch_size]

    py = SplitSampler(g, g.train_nodes(), pmap, args.partitions, fanouts,
                      args.batch_size, capacities=caps, seed=1)
    t0 = time.perf_counter()
    raw = py._sample_raw(nodes)
    t_sample = time.perf_counter() - t0
    t0 = time.perf_counter()
    py.slice_raw(raw)
    t_slice = time.perf_counter() - t0

    nat = NativeSplitSampler(g, g.train_nodes(), pmap, args.partitions,
                             fanouts, args.batch_size, capacities=caps,
                             seed=1, num_workers=1)
    nat.sample_batch(nodes)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        nat.sample_batch(nodes)
    t_native = (time.perf_counter() - t0) / reps
    nat.close()

    rec = _record("exp1", {
        "graph": f"random-{g.num_nodes}", "batch_size": args.batch_size,
        "fanouts": fanouts,
        "numpy_sample_s": round(t_sample, 4),
        "numpy_slice_s": round(t_slice, 4),
        "native_batch_s": round(t_native, 4),
        "speedup": round((t_sample + t_slice) / t_native, 2),
        "note": "the speedup column compares against the CURRENT numpy "
                "slicer and is config-dependent — records are not "
                "comparable across configs or rounds (the early 20.35x "
                "record predates the round-2 numpy vectorization that made "
                "the baseline ~3x faster; at 200k/[10,10,25] both paths "
                "improved and the ratio is now ~5x). Per-worker ns/edge "
                "history lives in slicer_opt.jsonl.",
    })
    print("| phase | seconds/batch |")
    print("|---|---|")
    print(f"| numpy sample | {t_sample:.4f} |")
    print(f"| numpy slice | {t_slice:.4f} |")
    print(f"| native sample+slice (incl convert) | {t_native:.4f} |")
    print(f"| native speedup | {rec['speedup']}x |")


def exp2(args):
    """Full-graph partitioned aggregation (reference exp2: move/aggr/merge
    cost for full-graph 4-GPU aggregation under METIS vs naive partition,
    /root/reference/experiments/exp2/exp2.txt:54 — timed over the ENTIRE
    graph, not a minibatch). One fanout=-1 layer whose targets are ALL
    nodes: every edge of the graph aggregates once, partials shuffle to
    their owners. Times feature movement (host gather + H2D) and the
    sharded aggregate+shuffle separately per partition mode."""
    import jax
    import jax.numpy as jnp

    from occ_gnn_tpu.data import partition_graph
    from occ_gnn_tpu.parallel.model import SplitGCN, make_split_forward
    from occ_gnn_tpu.parallel.split import make_mesh
    from occ_gnn_tpu.sampling.slicer import SplitSampler
    from occ_gnn_tpu.training import gather_features

    g = _test_graph(args)
    P = args.partitions
    mesh = make_mesh(P)
    model = SplitGCN(g.feature_dim, 32, g.num_classes, 1)
    params = model.init(jax.random.PRNGKey(0))
    fwd = make_split_forward(model, mesh)
    all_nodes = np.arange(g.num_nodes, dtype=np.int64)
    rows = []
    for mode in ("round_robin", "greedy"):
        pmap = partition_graph(g, P, mode=mode, attach=False)
        s = SplitSampler(g, all_nodes, pmap, P, [-1], g.num_nodes, seed=0)
        batch = s.sample_batch(all_nodes)
        t0 = time.perf_counter()
        xs = jnp.stack([
            gather_features(g.features, np.asarray(batch.input_nodes)[p])
            for p in range(P)
        ])
        jax.block_until_ready(xs)
        t_move = time.perf_counter() - t0
        out = fwd(params, batch, xs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = fwd(params, batch, xs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 5
        shuffle = sum(int((np.asarray(l.push_idx) >= 0).sum())
                      for l in batch.layers)
        from occ_gnn_tpu.parallel.split import count_layer_edges
        edges = sum(count_layer_edges(l) for l in batch.layers)
        assert edges == g.num_edges + g.num_nodes, \
            "full-graph slice must cover every edge (+ self loops)"
        rows.append((mode, edges, shuffle, t_move, dt))
    _record("exp2", {"full_graph": True, "num_nodes": g.num_nodes,
                     "num_edges": g.num_edges, "rows": [
        {"partition": m, "edges": e, "shuffle_rows": sh,
         "move_s": round(tm, 4), "aggr_merge_s": round(t, 4)}
        for m, e, sh, tm, t in rows
    ]})
    print("| partition | edges | shuffle rows | move s | aggr+merge s |")
    print("|---|---|---|---|---|")
    for m, e, sh, tm, t in rows:
        print(f"| {m} | {e} | {sh} | {tm:.4f} | {t:.4f} |")


def exp3(args):
    """Cache sweep: hit rate + feature-load time vs cache percentage
    (reference exp3: epoch time at 0/10/25/100% cache)."""
    from occ_gnn_tpu.cache import SingleChipCache
    from occ_gnn_tpu.sampling.neighbor import NeighborSampler

    g = _test_graph(args)
    fanouts = [int(f) for f in args.fan_out.split(",")]
    sampler = NeighborSampler(g, g.train_nodes(), fanouts, args.batch_size,
                              seed=0, drop_last=True)
    batches = []
    it = iter(sampler)
    for _ in range(min(len(sampler), 8)):
        batches.append(np.asarray(next(it).input_nodes))

    rows = []
    for pct in (0.0, 0.1, 0.25, 0.5, 1.0):
        if pct == 0.0:
            t0 = time.perf_counter()
            for b in batches:
                safe = np.maximum(b, 0)
                _ = g.features[safe]
            dt = time.perf_counter() - t0
            rows.append((pct, 0.0, dt / len(batches)))
            continue
        cache = SingleChipCache(g, pct, sampler.caps["frame_caps"][0])
        import jax

        out = cache.load_input_frame(batches[0])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for b in batches:
            out = cache.load_input_frame(b)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        rows.append((pct, cache.hit_rate, dt / len(batches)))

    _record("exp3", {"rows": [
        {"cache_pct": p, "hit_rate": round(h, 4),
         "load_s_per_batch": round(t, 5)} for p, h, t in rows
    ]})
    print("| cache % | hit rate | feature load s/batch |")
    print("|---|---|---|")
    for p, h, t in rows:
        print(f"| {int(p*100)} | {h:.3f} | {t:.5f} |")


def exp4(args):
    """Analytic split-benefit metrics from the partition map (reference
    exp4: naive-move / cross-edge / cache-benefit / redundancy / skew
    estimated without running the system)."""
    from occ_gnn_tpu.cache import CachePlan
    from occ_gnn_tpu.data import partition_graph
    from occ_gnn_tpu.data.partition import edge_cut_fraction
    from occ_gnn_tpu.sampling.slicer import SplitSampler

    g = _test_graph(args)
    fanouts = [int(f) for f in args.fan_out.split(",")]
    rows = []
    for mode in ("round_robin", "random", "greedy"):
        pmap = partition_graph(g, args.partitions, mode=mode, attach=False)
        cut = edge_cut_fraction(g, pmap)
        plan = CachePlan(g, pmap, args.partitions, 0.25,
                         refresh_cap=8)
        s = SplitSampler(g, g.train_nodes(), pmap, args.partitions, fanouts,
                         args.batch_size, seed=3, cache=plan)
        batch = s.sample_batch(g.train_nodes()[: args.batch_size])
        shuffle = sum(int((np.asarray(l.push_idx) >= 0).sum())
                      for l in batch.layers)
        owned = sum(int(np.asarray(l.num_owned).sum())
                    for l in batch.layers)
        from occ_gnn_tpu.parallel.split import count_layer_edges
        per_p = np.stack([
            count_layer_edges(l, per_partition=True)
            for l in batch.layers
        ]).sum(axis=0)
        skew = float(per_p.max() / max(per_p.mean(), 1))
        rows.append((mode, cut, shuffle / max(owned, 1), skew))
    _record("exp4", {"rows": [
        {"partition": m, "edge_cut": round(c, 4),
         "shuffle_per_owned": round(s, 4), "edge_skew": round(k, 3)}
        for m, c, s, k in rows
    ]})
    print("| partition | edge cut | shuffle/owned | edge skew |")
    print("|---|---|---|---|")
    for m, c, s, k in rows:
        print(f"| {m} | {c:.3f} | {s:.3f} | {k:.2f} |")


def exp5(args):
    """Pipeline overlap study (reference exp5: slice cost dominated the
    epoch; here we measure how much of the host sampling+slicing cost the
    pipelined C++ service hides behind device steps)."""
    import jax
    import jax.numpy as jnp
    import optax

    from occ_gnn_tpu.data import partition_graph
    from occ_gnn_tpu.parallel.model import SplitSAGE, make_split_train_step
    from occ_gnn_tpu.parallel.split import make_mesh
    from occ_gnn_tpu.sampling.native import NativeSplitSampler
    from occ_gnn_tpu.sampling.slicer import measure_split_capacities

    g = _test_graph(args)
    P = args.partitions if args.cpu else 1
    pmap = (partition_graph(g, P, mode="greedy") if P > 1
            else np.zeros(g.num_nodes, dtype=np.int32))
    fanouts = [int(f) for f in args.fan_out.split(",")]
    caps = measure_split_capacities(g, g.train_nodes(), pmap, P, fanouts,
                                    args.batch_size, num_batches=2)
    mesh = make_mesh(P)
    model = SplitSAGE(g.feature_dim, 64, g.num_classes, len(fanouts))
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    ost = opt.init(params)
    step = make_split_train_step(model, opt, mesh)

    def gather(batch):
        from occ_gnn_tpu.training import gather_features

        return jnp.stack([
            gather_features(g.features, np.asarray(batch.input_nodes)[p])
            for p in range(P)
        ])

    def run_epoch(workers):
        nat = NativeSplitSampler(g, g.train_nodes(), pmap, P, fanouts,
                                 args.batch_size, capacities=caps, seed=2,
                                 num_workers=workers, drop_last=True)
        nonlocal params, ost
        it = iter(nat)
        b0 = next(it)
        params, ost, loss, _, _ = step(params, ost, b0, gather(b0))
        jax.block_until_ready(loss)
        n = 0
        t0 = time.perf_counter()
        for b in it:
            params, ost, loss, _, _ = step(params, ost, b, gather(b))
            n += 1
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0
        nat.close()
        return dt / max(n, 1)

    serial = run_epoch(workers=1)
    pipelined = run_epoch(workers=2)

    # H2D staging overlap (train.py's lag-1 pipeline): gather+stage batch
    # n+1 while the device runs step n, vs blocking on every step.
    def run_gather(lag1: bool):
        nonlocal params, ost
        nat = NativeSplitSampler(g, g.train_nodes(), pmap, P, fanouts,
                                 args.batch_size, capacities=caps, seed=4,
                                 num_workers=2, drop_last=True)
        it = iter(nat)
        b0 = next(it)
        params, ost, loss, _, _ = step(params, ost, b0, gather(b0))
        jax.block_until_ready(loss)
        n = 0
        pending = None
        t0 = time.perf_counter()
        for b in it:
            xs = gather(b)
            if pending is not None and not lag1:
                jax.block_until_ready(pending)
            params, ost, loss, _, _ = step(params, ost, b, xs)
            if not lag1:
                loss = jax.block_until_ready(loss)
            pending = loss
            n += 1
        jax.block_until_ready(pending)
        dt = time.perf_counter() - t0
        nat.close()
        return dt / max(n, 1)

    gather_serial = run_gather(lag1=False)
    gather_lag1 = run_gather(lag1=True)

    rec = _record("exp5", {
        "serial_s_per_batch": round(serial, 4),
        "pipelined_s_per_batch": round(pipelined, 4),
        "overlap_speedup": round(serial / pipelined, 3),
        "gather_blocking_s_per_batch": round(gather_serial, 4),
        "gather_lag1_s_per_batch": round(gather_lag1, 4),
        "gather_overlap_speedup": round(gather_serial / gather_lag1, 3),
    })
    print("| config | s/batch |")
    print("|---|---|")
    print(f"| 1 worker | {serial:.4f} |")
    print(f"| 2 workers (pipelined) | {pipelined:.4f} |")
    print(f"| speedup | {rec['overlap_speedup']}x |")
    print(f"| blocking feature staging | {gather_serial:.4f} |")
    print(f"| lag-1 staged (train.py) | {gather_lag1:.4f} |")
    print(f"| gather overlap speedup | {rec['gather_overlap_speedup']}x |")


def exp6(args):
    """OCC (split) vs DDP vs PaGraph-cache vs Quiver (reference exp6,
    /root/reference/experiments/exp6/exp6.txt) on a LEARNABLE community
    graph (block structure predicts labels — final accuracy is
    meaningful, unlike a random-label graph) with a per-mode phase table
    (sample/slice/feature-load/step) from the trainers' PhaseTimers."""
    from occ_gnn_tpu import train as trainer

    common = ["--graph", "community", "--num-nodes", str(args.num_nodes),
              "--avg-degree", str(args.avg_degree),
              "--feature-dim", str(args.feature_dim),
              "--fan-out", args.fan_out,
              "--batch-size", str(args.batch_size),
              "--num-hidden", str(args.num_hidden),
              "--num-epochs", str(args.num_epochs),
              "--dtype", args.dtype]
    if args.cpu:
        common.append("--cpu")
    if args.limit_train:
        common += ["--limit-train", str(args.limit_train)]
    if args.feature_pad:
        common += ["--feature-pad", str(args.feature_pad)]
    results = {}
    for mode in args.modes.split(","):
        argv = common + ["--mode", mode]
        if mode in ("split", "pa-cache"):
            argv += ["--cache-per", str(args.cache_per)]
        if mode in ("split", "pa-cache", "ddp", "single"):
            # every padded-sampler mode gets measured (not worst-case)
            # budgets — identical capacity-tuning treatment
            argv += ["--measure-caps"]
        t0 = time.perf_counter()
        m = trainer.main(argv)
        m["wall_s"] = round(time.perf_counter() - t0, 2)
        results[mode] = m
    import jax

    results["config"] = {
        "platform": jax.devices()[0].platform,
        "num_nodes": args.num_nodes, "avg_degree": args.avg_degree,
        "feature_dim": args.feature_dim, "fan_out": args.fan_out,
        "batch_size": args.batch_size, "hidden": args.num_hidden,
        "epochs": args.num_epochs, "cache_per": args.cache_per,
        "limit_train": args.limit_train, "dtype": args.dtype,
    }
    # Context the raw walls need: on the virtual CPU mesh all 8 "chips"
    # share the host cores, so split's 8-partition shard_map step and its
    # host slicing COMPETE for the same CPUs that pa-cache's single-device
    # path has to itself — wall-clock ranking here reflects host-core
    # contention, not the TPU pipeline (exp5 and bench.py measure that).
    if args.cpu:
        results["note"] = (
            "CPU-mesh walls: 8 emulated devices share the host cores; "
            "single-device modes (pa-cache) avoid the 8-way shard_map "
            "emulation + slicing overhead. Device-step cost and overlap on "
            "real chips are covered by bench.py and exp5."
        )
    else:
        results["note"] = (
            "single-chip TPU run (P=1): split's multi-chip advantage "
            "(redundancy removal across partitions) cannot appear at P=1 "
            "— what this measures is the per-mode host pipeline + step "
            "cost at identical target/fanout/batch settings; on this "
            "harness every host->device batch transfer rides a ~0.09 GB/s "
            "loopback relay (see bench_tpu h2d_gbps_measured), which "
            "penalizes the modes that move features per batch (split "
            "cache tails, ddp/pa-cache input frames) and flatters the "
            "device-resident quiver mode"
        )
    _record("exp6", results)
    print("| mode | final acc | wall s | phases (last epoch) |")
    print("|---|---|---|---|")
    for mode, m in results.items():
        if not isinstance(m, dict) or "acc" not in m:
            continue
        ph = " ".join(f"{k}={v}" for k, v in m.get("phases", {}).items())
        print(f"| {mode} | {m['acc']:.4f} | {m['wall_s']} | {ph} |")


def exp7(args):
    """Redundancy, measured (the flagship thesis quantified): for the SAME
    stream of global batches, compare what P independent data-parallel
    chips each do (per-chip sampling + a replicated top-degree cache — the
    execution model of DDP / PaGraph / Quiver,
    /root/reference/python/pa_cache_multi_gpu.py:43-90) against ONE
    split-parallel slicing of the batch across P partitions
    (/root/reference/python/layers/dist_sageconv.py). The reference's exp4
    ESTIMATED this redundancy analytically from the partition map; here it
    is MEASURED from real sampled subgraphs, per batch:

      ddp:   chip c samples its own L-hop subgraph for B/P targets. A node
             reached by several chips' frontiers is re-gathered, and its
             aggregation + hidden rep re-computed, on EVERY chip that
             touches it; per-chip caches replicate the same hot rows.
      split: the batch is sampled once and partitioned — every frontier
             node's aggregation and hidden rep is computed on exactly one
             owner, and the P per-chip cache budgets hold DISTINCT rows.
             The price, also measured here: boundary partial-sum rows
             shuffled over ICI (one all_to_all per layer) + cache-miss
             refresh tails.

    Relation to the reference's exp4 (experiments/exp4/populate_table.py):
    that script also counts redundancy/communication from real sampled
    NodeFlows. What this experiment adds is a same-global-batch
    comparison (both modes consume the identical target stream),
    cache-miss BYTE accounting against each mode's actual cache policy,
    and dedup of shuffle rows — not a measured-vs-estimated contrast.

    Features are never read (graph is built with a tiny feature_dim);
    byte figures use the nominal --feature-dim at bf16 (the production
    cache dtype) and hidden-H f32 for shuffle partials.
    """
    from occ_gnn_tpu.cache import CachePlan
    from occ_gnn_tpu.data import partition_graph, random_graph
    from occ_gnn_tpu.sampling.neighbor import (
        dedup_first_occurrence,
        sample_layer_edges,
    )

    nominal_fdim = args.feature_dim
    g = random_graph(num_nodes=args.num_nodes, avg_degree=args.avg_degree,
                     feature_dim=min(args.feature_dim, 4), num_classes=32,
                     seed=0, power_law=args.power_law)
    fanouts = [int(f) for f in args.fan_out.split(",")]
    B = args.batch_size
    nb = args.num_batches
    H = args.num_hidden
    targets = g.train_nodes()[: B * nb]

    def sample_subgraph(seeds, rng):
        """Raw L-hop sample (exact SplitSampler/NeighborSampler semantics):
        returns (frontiers outermost-first incl targets, edge lists of
        (dst_global, src_global) per layer, deepest frame)."""
        frontier = np.unique(np.asarray(seeds, dtype=np.int64))
        frontiers, edges = [frontier], []
        for fanout in fanouts:
            e_dst, e_src = sample_layer_edges(g, frontier, fanout, rng)
            edges.append((frontier[e_dst], e_src))
            frontier, _, _ = dedup_first_occurrence(frontier, e_src)
            frontiers.append(frontier)
        return frontiers, edges

    rows = []
    for P in (2, 4, 8):
        if B % P != 0:
            # ddp slices batch[c*(B//P):(c+1)*(B//P)] per chip — a remainder
            # would silently drop targets from ddp but not split, breaking
            # the same-global-batch premise (ADVICE r3).
            raise SystemExit(
                f"exp7 requires --batch-size divisible by P={P} "
                f"(got {B}); both modes must see the same targets"
            )
        pmap = partition_graph(g, P, mode="greedy", attach=False)
        plan = CachePlan(g, pmap, P, args.cache_per, refresh_cap=1)
        # Replicated per-chip cache, same per-chip budget: global
        # top-out-degree rows (PaGraph policy).
        order = np.argsort(-g.out_degrees(), kind="stable")
        ddp_cached = np.zeros(g.num_nodes, dtype=bool)
        ddp_cached[order[: plan.static_size]] = True
        split_cached = plan.owner_local >= 0  # partitioned: P*budget rows

        acc = {k: 0 for k in ("ddp_edges", "split_edges", "ddp_hidden",
                              "split_hidden", "ddp_feat", "split_feat",
                              "union_feat", "ddp_miss", "split_miss",
                              "shuffle_rows")}
        for b in range(nb):
            batch = targets[b * B : (b + 1) * B]
            # --- DDP: P chips, B/P targets each, independent samples.
            chip_frames = []
            for c in range(P):
                rng = np.random.default_rng(10_000 * P + 100 * b + c)
                frontiers, edges = sample_subgraph(
                    batch[c * (B // P) : (c + 1) * (B // P)], rng
                )
                acc["ddp_edges"] += sum(e[0].shape[0] for e in edges)
                acc["ddp_hidden"] += sum(f.shape[0] for f in frontiers[:-1])
                frame = frontiers[-1]
                chip_frames.append(frame)
                acc["ddp_feat"] += frame.shape[0]
                acc["ddp_miss"] += int((~ddp_cached[frame]).sum())
            acc["union_feat"] += np.unique(
                np.concatenate(chip_frames)
            ).shape[0]
            # --- Split: one sample of the whole batch, partitioned.
            rng = np.random.default_rng(20_000 * P + 100 * b)
            frontiers, edges = sample_subgraph(batch, rng)
            acc["split_edges"] += sum(e[0].shape[0] for e in edges)
            acc["split_hidden"] += sum(f.shape[0] for f in frontiers[:-1])
            frame = frontiers[-1]
            acc["split_feat"] += frame.shape[0]
            acc["split_miss"] += int((~split_cached[frame]).sum())
            # Boundary partials: one row per (dst node, contributing
            # foreign partition) pair, per layer (natural-edge routing:
            # edges live on the src's owner).
            for dst_g, src_g in edges:
                po = pmap[src_g].astype(np.int64)
                foreign = po != pmap[dst_g]
                acc["shuffle_rows"] += np.unique(
                    dst_g[foreign] * P + po[foreign]
                ).shape[0]

        r = {
            "P": P,
            "edges_ratio": round(acc["ddp_edges"] / acc["split_edges"], 3),
            "hidden_rows_ratio": round(
                acc["ddp_hidden"] / acc["split_hidden"], 3),
            "feature_rows_ratio": round(
                acc["ddp_feat"] / acc["split_feat"], 3),
            "frontier_dup_factor": round(
                acc["ddp_feat"] / acc["union_feat"], 3),
            "miss_rows_ratio": round(
                acc["ddp_miss"] / max(acc["split_miss"], 1), 3),
            "ddp_miss_mb_per_batch": round(
                acc["ddp_miss"] * nominal_fdim * 2 / nb / 2**20, 2),
            "split_refresh_mb_per_batch": round(
                acc["split_miss"] * nominal_fdim * 2 / nb / 2**20, 2),
            "split_shuffle_mb_per_batch": round(
                acc["shuffle_rows"] * H * 4 / nb / 2**20, 2),
            "counts_per_batch": {
                k: acc[k] // nb for k in sorted(acc)
            },
        }
        rows.append(r)

    _record("exp7", {
        "graph": f"random-{g.num_nodes}n-{g.num_edges}e",
        "power_law": args.power_law,
        "fan_out": args.fan_out, "batch_size": B, "num_batches": nb,
        "cache_per_chip": args.cache_per, "feature_dim": nominal_fdim,
        "hidden": H, "rows": rows,
        "note": (
            "measured from real sampled subgraphs (identical sampling "
            "semantics both modes): ddp_* sums over P independent chips "
            "processing the same global batch; split_* is one partitioned "
            "slicing of it. miss rows use equal PER-CHIP cache budgets "
            "(replicated top-degree vs owner-partitioned). The synthetic "
            "graph has power-law-ish source popularity (synthetic.py "
            "power_law=0.8); real graphs with heavier hub skew duplicate "
            "hub nodes across more chips, pushing the ratios higher."
        ),
    })
    print("| P | edges x | hidden x | feat-rows x | dup factor | "
          "miss x | ddp miss MB/b | split refresh MB/b | shuffle MB/b |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['P']} | {r['edges_ratio']} | {r['hidden_rows_ratio']} "
              f"| {r['feature_rows_ratio']} | {r['frontier_dup_factor']} "
              f"| {r['miss_rows_ratio']} | {r['ddp_miss_mb_per_batch']} "
              f"| {r['split_refresh_mb_per_batch']} "
              f"| {r['split_shuffle_mb_per_batch']} |")


def main(argv=None):
    p = argparse.ArgumentParser("experiments")
    p.add_argument("exp", choices=["exp1", "exp2", "exp3", "exp4", "exp5",
                                   "exp6", "exp7"])
    p.add_argument("--num-nodes", type=int, default=20000)
    p.add_argument("--avg-degree", type=int, default=10)
    p.add_argument("--feature-dim", type=int, default=64)
    p.add_argument("--fan-out", type=str, default="10,10")
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--partitions", type=int, default=4)
    p.add_argument("--cpu", action="store_true")
    # exp6 extras (TPU-scale runs): model sweep, epoch/limit control.
    p.add_argument("--num-hidden", type=int, default=64)
    p.add_argument("--num-epochs", type=int, default=3)
    p.add_argument("--modes", type=str, default="split,ddp,pa-cache,quiver")
    p.add_argument("--cache-per", type=float, default=0.25)
    p.add_argument("--limit-train", type=int, default=0)
    p.add_argument("--num-batches", type=int, default=4)
    # exp7: source-popularity skew of the synthetic graph (synthetic.py
    # random_graph power_law; smaller = heavier hub tail).
    p.add_argument("--power-law", type=float, default=0.8)
    p.add_argument("--feature-pad", type=int, default=0)
    p.add_argument("--dtype", type=str, default="float32")
    args = p.parse_args(argv)
    if args.cpu:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    globals()[args.exp](args)


if __name__ == "__main__":
    main()
