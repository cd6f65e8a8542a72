"""Training CLI — the entry point of the framework.

Usage (argument names follow the reference trainer,
/root/reference/python/train.py:108-140):

    python -m occ_gnn_tpu.train --graph community --mode split \
        --cache-per 0.25 --fan-out 10,10 --batch-size 256 --num-epochs 3

Modes:
  split     split-parallel training over the device mesh (the flagship —
            reference train.py), with a per-partition feature cache when
            --cache-per is set
  single    one-chip sampled-minibatch training
  ddp       data-parallel baseline (reference no_cache_multi_gpu.py)
  pa-cache  single-chip + PaGraph-style static cache with hit-rate logging
            (reference pa_cache_multi_gpu.py)

Graphs: a name under --data-root (binary format, see occ_gnn_tpu.data) or
the built-in synthetics ``community`` / ``random``.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("occ_gnn_tpu trainer")
    p.add_argument("--graph", type=str, required=True)
    p.add_argument("--data-root", type=str, default="./data")
    p.add_argument("--mode", type=str, default="split",
                   choices=["split", "single", "ddp", "pa-cache", "quiver",
                            "infer"])
    p.add_argument("--model-name", type=str, default="sage",
                   choices=["sage", "gcn", "gat"])
    p.add_argument("--cache-per", type=str, default="0",
                   help="feature-cache fraction of the graph (reference "
                        "memory_manager knob), or 'auto' to size the "
                        "cache to the chip's free HBM (cache/autosize.py "
                        "— at products scale the whole table fits and "
                        "the per-batch refresh tail disappears)")
    p.add_argument("--fan-out", type=str, default="10,10,25")
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--num-hidden", type=int, default=256)
    p.add_argument("--num-epochs", type=int, default=2)
    p.add_argument("--num-heads", type=int, default=4)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--partitions", type=int, default=0,
                   help="mesh size for split/ddp; 0 = all devices")
    p.add_argument("--partition-mode", type=str, default="greedy",
                   choices=["greedy", "metis", "random", "round_robin"])
    p.add_argument("--sampler", type=str, default="native",
                   choices=["native", "numpy"],
                   help="split-mode sampler backend (native = pipelined C++)")
    p.add_argument("--innermost", type=str, default="auto",
                   choices=["auto", "host", "device"],
                   help="where the innermost fanout expansion runs: "
                        "'device' samples it inside the jitted step from "
                        "a resident CSR (needs the native sampler and a "
                        "fully replicated cache, e.g. --cache-per auto at "
                        "products scale) — the arena payload and host "
                        "sampling cost both drop ~5x; 'auto' picks device "
                        "whenever eligible")
    p.add_argument("--measure-caps", action="store_true",
                   help="measure padding capacities from a few batches "
                        "instead of worst-case planning")
    p.add_argument("--caps-margin", type=float, default=0.0,
                   help="headroom factor over measured capacity maxima "
                        "(0 = auto: 1.2 under device-innermost sampling, "
                        "1.35 otherwise — the r5 margin sweep showed the "
                        "on-chip synthesis cost scales with the layer-0 "
                        "cap; overflow still auto-replans at 1.5x)")
    p.add_argument("--num-workers", type=int, default=2,
                   help="C++ sampler worker threads")
    p.add_argument("--sample-without-replacement", action="store_true",
                   help="DGL sample_neighbors semantics instead of the "
                        "reference slicer's with-replacement draws")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="activation/cache storage precision")
    p.add_argument("--save-dir", type=str, default="",
                   help="checkpoint directory (saves every epoch)")
    p.add_argument("--resume", type=str, default="",
                   help="checkpoint file to resume from")
    p.add_argument("--infer-nodes", type=str, default="test",
                   choices=["train", "val", "test", "all"],
                   help="node set for --mode infer")
    p.add_argument("--output", type=str, default="",
                   help="write predictions (npy) for --mode infer")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--limit-train", type=int, default=0,
                   help="cap the train-node set (benchmarking aid: "
                        "per-epoch phase tables at scale without paying "
                        "full epochs; 0 = all train nodes)")
    p.add_argument("--num-nodes", type=int, default=10000,
                   help="synthetic graph size")
    p.add_argument("--avg-degree", type=int, default=10)
    p.add_argument("--feature-dim", type=int, default=128)
    p.add_argument("--eval", action="store_true",
                   help="evaluate on val/test masks after training")
    p.add_argument("--mmap-features", action="store_true",
                   help="memory-map features.bin (papers100M-scale)")
    p.add_argument("--feature-pad", type=int, default=0,
                   help="zero-pad feature_dim to a multiple of this "
                        "(128 lane-aligns rows: TPU gathers run up to "
                        "~4x faster; inert for the math)")
    p.add_argument("--profile-dir", type=str, default="",
                   help="capture a jax profiler trace of a few steps")
    p.add_argument("--cpu", action="store_true",
                   help="force CPU backend (virtual 8-device mesh)")
    p.add_argument("--cpu-devices", type=int, default=8,
                   help="virtual device count per process with --cpu")
    p.add_argument("--json", action="store_true",
                   help="emit one JSON line of final metrics")
    # Multi-host (pod) launch: one trainer process per host. On real TPU
    # pods the three coordinator args are auto-discovered (plain
    # jax.distributed.initialize()); set them explicitly for CPU clusters
    # or tests. Split mode then shards the mesh AND the slicing work
    # across hosts (emit_range) and assembles per-host cache frames
    # (SURVEY.md §7 step 6 — the reference never ran beyond one box).
    p.add_argument("--distributed", action="store_true",
                   help="join a jax.distributed cluster (multi-host pod)")
    p.add_argument("--coordinator-address", type=str, default="",
                   help="host:port of process 0 (empty = auto-discover)")
    p.add_argument("--num-processes", type=int, default=-1)
    p.add_argument("--process-id", type=int, default=-1)
    return p


def resolve_graph(args):
    from occ_gnn_tpu.data import block_graph, load_graph, random_graph

    if args.graph == "community":
        return block_graph(num_nodes=args.num_nodes, num_blocks=8,
                           avg_degree=args.avg_degree,
                           feature_dim=args.feature_dim, seed=args.seed)
    if args.graph == "random":
        return random_graph(num_nodes=args.num_nodes,
                            avg_degree=args.avg_degree,
                            feature_dim=args.feature_dim, seed=args.seed)
    return load_graph(args.data_root, args.graph,
                      mmap_features=args.mmap_features)


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.cpu:
        import os

        os.environ.setdefault(
            "XLA_FLAGS",
            f"--xla_force_host_platform_device_count={args.cpu_devices}",
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.distributed:
        import jax

        if not jax.distributed.is_initialized():
            kw = {}
            if args.coordinator_address:
                kw = dict(coordinator_address=args.coordinator_address,
                          num_processes=args.num_processes,
                          process_id=args.process_id)
            jax.distributed.initialize(**kw)
        print(f"distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {len(jax.devices())} global devices")
    import jax
    import jax.numpy as jnp
    import optax

    from occ_gnn_tpu.utils import PhaseTimers

    fanouts = [int(f) for f in args.fan_out.split(",")]
    g = resolve_graph(args)
    if args.feature_pad > 1:
        g = g.pad_feature_dim(args.feature_pad)
    print(f"graph: {g.num_nodes} nodes, {g.num_edges} edges, "
          f"feat {g.feature_dim}, {g.num_classes} classes")
    timers = PhaseTimers()
    metrics = {}

    if args.mode == "infer":
        metrics = run_infer(args, g, fanouts, timers)
    elif args.mode == "split":
        metrics = train_split(args, g, fanouts, timers)
    elif args.mode == "ddp":
        metrics = train_ddp(args, g, fanouts, timers)
    elif args.mode == "quiver":
        metrics = train_quiver(args, g, fanouts, timers)
    else:
        metrics = train_single(args, g, fanouts, timers,
                               use_cache=(args.mode == "pa-cache"))
    if args.json:
        print(json.dumps(metrics))
    return metrics


def _make_model(args, g, split: bool):
    if split:
        from occ_gnn_tpu.parallel.model import SplitGAT, SplitGCN, SplitSAGE

        import jax.numpy as jnp

        dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
        cls = {"sage": SplitSAGE, "gcn": SplitGCN, "gat": SplitGAT}[
            args.model_name
        ]
        if args.model_name == "gat":
            return cls(g.feature_dim, args.num_hidden, g.num_classes,
                       len(args.fan_out.split(",")),
                       num_heads=args.num_heads)
        return cls(g.feature_dim, args.num_hidden, g.num_classes,
                   len(args.fan_out.split(",")), dtype=dtype)
    from occ_gnn_tpu.models import get_model

    kw = dict(dropout=args.dropout)
    if args.model_name == "gat":
        kw["num_heads"] = args.num_heads
    return get_model(args.model_name, g.feature_dim, args.num_hidden,
                     g.num_classes, len(args.fan_out.split(",")), **kw)


def run_infer(args, g, fanouts, timers):
    """Sharded inference: load a checkpoint, forward over the requested
    node set, report accuracy and optionally dump per-node predictions.
    (The reference explicitly raised NotImplemented on inference,
    models/sage.py:40-41 — this completes the serving story.)"""
    import jax
    import jax.numpy as jnp
    import optax

    from occ_gnn_tpu.data import partition_graph
    from occ_gnn_tpu.parallel.model import make_split_forward
    from occ_gnn_tpu.parallel.split import make_mesh
    from occ_gnn_tpu.sampling.slicer import SplitSampler
    from occ_gnn_tpu.training import gather_features
    from occ_gnn_tpu.utils.checkpoint import load_checkpoint

    if not args.resume:
        raise SystemExit("--mode infer requires --resume <checkpoint>")
    P = args.partitions or len(jax.devices())
    pmap = (g.partition_map
            if g.partition_map is not None and g.partition_map.max() == P - 1
            else partition_graph(g, P, mode=args.partition_mode))
    mesh = make_mesh(P)
    model = _make_model(args, g, split=True)
    params = model.init(jax.random.PRNGKey(args.seed))
    opt = optax.adam(args.lr)
    params, _, epoch = load_checkpoint(args.resume, params, opt.init(params))
    print(f"loaded {args.resume} (epoch {epoch})")

    masks = {"train": g.train_mask, "val": g.val_mask, "test": g.test_mask}
    if args.infer_nodes == "all":
        nodes = np.arange(g.num_nodes, dtype=np.int64)
    else:
        nodes = np.nonzero(masks[args.infer_nodes])[0]
    if args.sampler == "native":
        from occ_gnn_tpu.sampling.native import NativeSplitSampler

        sampler = NativeSplitSampler(
            g, nodes, pmap, P, fanouts, args.batch_size, seed=args.seed,
            num_workers=args.num_workers,
            replace=not args.sample_without_replacement,
        )
    else:
        sampler = SplitSampler(g, nodes, pmap, P, fanouts, args.batch_size,
                               seed=args.seed,
                               replace=not args.sample_without_replacement)
    fwd = make_split_forward(model, mesh)
    preds = np.full(g.num_nodes, -1, dtype=np.int32)
    correct = total = 0
    for batch in sampler:
        with timers.phase("infer_step"):
            xs = jnp.stack([
                gather_features(g.features, batch.input_nodes[p])
                for p in range(P)
            ])
            logits = np.asarray(fwd(params, batch, xs))
        labels = np.asarray(batch.labels)
        tgt = np.asarray(batch.target_nodes)
        pred = logits.argmax(-1)
        valid = labels >= 0
        preds[tgt[valid]] = pred[valid]
        correct += int((pred[valid] == labels[valid]).sum())
        total += int(valid.sum())
    if hasattr(sampler, "close"):
        sampler.close()
    acc = correct / max(total, 1)
    print(f"infer accuracy ({args.infer_nodes}): {acc:.4f} over {total}")
    out = {"mode": "infer", "acc": acc, "count": total}
    if args.output:
        np.save(args.output, preds)
        out["output"] = args.output
    return out


def _train_nodes(args, g) -> np.ndarray:
    nodes = g.train_nodes()
    if args.limit_train and args.limit_train < nodes.shape[0]:
        nodes = nodes[: args.limit_train]
    return nodes


def _gather_xs(g, batch, P, multihost=False, mesh=None):
    """Per-partition input-frame features. Multi-host: gather THIS host's
    rows from host RAM and assemble the global sharded array."""
    import jax.numpy as jnp

    from occ_gnn_tpu.training import gather_features

    if multihost:
        from occ_gnn_tpu.parallel.multihost import assemble_global

        local_nodes = batch._local_input_nodes
        xs_local = np.stack([
            np.asarray(gather_features(g.features, local_nodes[i]))
            for i in range(local_nodes.shape[0])
        ])
        return assemble_global(mesh, xs_local)
    return jnp.stack([
        gather_features(g.features, batch.input_nodes[p])
        for p in range(P)
    ])


def train_split(args, g, fanouts, timers):
    import jax
    import jax.numpy as jnp
    import optax

    from occ_gnn_tpu.cache import CachePlan, SplitFeatureCache
    from occ_gnn_tpu.data import partition_graph
    from occ_gnn_tpu.parallel.model import make_split_train_step
    from occ_gnn_tpu.parallel.split import make_mesh
    from occ_gnn_tpu.sampling.slicer import SplitSampler
    from occ_gnn_tpu.training import gather_features

    P = args.partitions or len(jax.devices())
    with timers.phase("partition"):
        if g.partition_map is not None and g.partition_map.max() == P - 1:
            pmap = g.partition_map
        else:
            pmap = partition_graph(g, P, mode=args.partition_mode)
    mesh = make_mesh(P)
    # Multi-host: the mesh spans every process's chips; this host slices
    # only partitions [lo, hi) (emit_range) and holds only those rows of
    # the cache frames — sampler/cache work scales ~1/num_hosts while the
    # seeded sampling keeps all hosts bit-agreed with zero communication.
    multihost = jax.process_count() > 1
    if multihost:
        from occ_gnn_tpu.parallel.multihost import (
            MultiHostFeatureCache,
            MultiHostSplitSampler,
            local_partition_range,
        )

        lo, hi = local_partition_range(mesh)

    cache = None
    from occ_gnn_tpu.sampling.slicer import (
        measure_split_capacities,
        plan_split_capacities,
    )

    with timers.phase("capacity_plan"):
        safe_caps = plan_split_capacities(
            args.batch_size, fanouts, g.num_nodes, P
        )
        from occ_gnn_tpu.cache.autosize import resolve_cache_percentage

        cache_pct = resolve_cache_percentage(
            args.cache_per, g, pmap, P,
            dtype_bytes=2 if args.dtype == "bfloat16" else 4,
            refresh_cap=safe_caps["frame_caps"][0],
        )
        if args.cache_per == "auto":
            print(f"cache auto-sized to {cache_pct:.4f} of the graph "
                  f"({'no per-batch refresh' if cache_pct >= 1.0 / P else 'refreshing'})")
        # Innermost placement must be known before capacity measurement:
        # the best padding margin depends on it (r5 sweep — the on-chip
        # synthesis cost scales with the layer-0 cap).
        will_device = (
            args.innermost != "host"
            and args.sampler == "native"
            and cache_pct >= 1.0
            and not args.sample_without_replacement
            and fanouts[-1] > 0
            and g.num_edges < 2**31
        )
        margin = args.caps_margin or (1.2 if will_device else 1.35)
        if args.measure_caps:
            # Measure with the cache policy active — it changes where the
            # innermost layer's edges execute, hence the per-field maxima.
            probe_plan = None
            if cache_pct > 0:
                probe_plan = CachePlan(
                    g, pmap, P, cache_pct,
                    refresh_cap=safe_caps["frame_caps"][0],
                )
            caps = measure_split_capacities(
                g, g.train_nodes(), pmap, P, fanouts, args.batch_size,
                seed=args.seed + 99, cache_plan=probe_plan, margin=margin,
            )
        else:
            caps = dict(safe_caps)
    if cache_pct > 0:
        refresh_cap = max(caps.pop("refresh_cap", 0), 8) \
            if args.measure_caps else safe_caps["frame_caps"][0]
        import jax.numpy as jnp

        plan = CachePlan(g, pmap, P, cache_pct, refresh_cap=refresh_cap)
        fdtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
        if multihost:
            cache = MultiHostFeatureCache(plan, mesh, dtype=fdtype)
        else:
            cache = SplitFeatureCache(plan, dtype=fdtype)
    else:
        caps.pop("refresh_cap", None)

    # Device-innermost sampling eligibility (parallel/split.
    # synthesize_device_innermost): native sampler + fully replicated
    # cache + with-replacement draws + bounded innermost fanout.
    eligible_device = (
        args.sampler == "native"
        and cache is not None
        and getattr(cache.plan, "replicated", False)
        and not args.sample_without_replacement
        and fanouts[-1] > 0
        and g.num_edges < 2**31
    )
    innermost = args.innermost
    if innermost == "auto":
        innermost = "device" if eligible_device else "host"
    elif innermost == "device" and not eligible_device:
        raise SystemExit(
            "--innermost device needs --sampler native, a fully "
            "replicated cache (--cache-per auto/1.0), with-replacement "
            "sampling, a bounded innermost fanout, and < 2^31 edges"
        )
    csr = None
    if innermost == "device":
        from occ_gnn_tpu.parallel.model import make_device_csr

        csr = make_device_csr(g)
        print("innermost layer: device-sampled from resident CSR")

    def build_sampler(caps, nodes=None, seed=None):
        nodes = _train_nodes(args, g) if nodes is None else nodes
        seed = args.seed if seed is None else seed
        if args.sampler == "native":
            from occ_gnn_tpu.sampling.native import NativeSplitSampler

            inner = NativeSplitSampler(
                g, nodes, pmap, P, fanouts, args.batch_size,
                capacities=caps, seed=seed, cache=cache,
                num_workers=args.num_workers,
                replace=not args.sample_without_replacement,
                emit_range=(lo, hi) if multihost else None,
                innermost=innermost,
            )
        else:
            inner = SplitSampler(g, nodes, pmap, P, fanouts,
                                 args.batch_size, capacities=caps,
                                 seed=seed, cache=cache,
                                 replace=not args.sample_without_replacement)
        if multihost:
            return MultiHostSplitSampler(inner, mesh)
        return inner

    sampler = build_sampler(caps)

    model = _make_model(args, g, split=True)
    params = model.init(jax.random.PRNGKey(args.seed))
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)
    start_epoch = 0
    if args.resume:
        from occ_gnn_tpu.utils.checkpoint import load_checkpoint

        params, opt_state, start_epoch = load_checkpoint(
            args.resume, params, opt_state
        )
        print(f"resumed from {args.resume} at epoch {start_epoch}")
    step = make_split_train_step(model, opt, mesh, csr=csr)

    acc = loss_v = 0.0
    profiling = False
    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
        profiling = True
    from occ_gnn_tpu.sampling.slicer import scale_capacities

    # Dropout stream: one base key, folded with the global step counter so
    # every step (and every resume) draws a fresh mask.
    drop_key = (jax.random.PRNGKey(args.seed ^ 0x5EED)
                if args.dropout > 0 else None)
    # Device-innermost sampling stream (independent of dropout).
    sample_key = (jax.random.PRNGKey(args.seed ^ 0xD0C5)
                  if csr is not None else None)
    gstep = 0
    epoch = start_epoch
    replans = 0
    while epoch < args.num_epochs:
        t0 = time.perf_counter()
        correct = total = 0
        try:
            # Lag-1 pipeline: the host gathers + stages features for batch
            # n+1 while the device runs step n (JAX dispatch is async; the
            # blocking int() conversions for step n are deferred until the
            # next batch's staging is issued). This hides the H2D feature
            # copy behind device compute in the no-cache path
            # (reference motivation: exp5's slice/move overlap).
            pending = None  # (loss, correct, total) of the in-flight step
            for batch in sampler:
                if cache is not None:
                    xs = cache.frames
                else:
                    with timers.phase("feature_gather"):
                        xs = _gather_xs(g, batch, P, multihost,
                                        mesh if multihost else None)
                if pending is not None:
                    loss, c, t = pending
                    correct += int(c)
                    total += int(t)
                with timers.phase("train_step"):
                    params, opt_state, loss, c, t = step(
                        params, opt_state, batch, xs,
                        rng=(jax.random.fold_in(drop_key, gstep)
                             if drop_key is not None else None),
                        sample_rng=(jax.random.fold_in(sample_key, gstep)
                                    if sample_key is not None else None),
                    )
                gstep += 1
                pending = (loss, c, t)
            if pending is not None:
                loss, c, t = pending
                loss = jax.block_until_ready(loss)
                correct += int(c)
                total += int(t)
        except ValueError as e:
            if "overflow" not in str(e):
                raise
            replans += 1
            if replans > 8:
                # Growing budgets is not converging — the overflow is not a
                # padding-budget problem (e.g. a degree bound violated).
                raise
            # A tail batch exceeded the measured padding budget: grow every
            # capacity 1.5x, rebuild the sampler, redo the epoch (one
            # recompile — the alternative is a crash mid-training).
            caps = scale_capacities(caps, 1.5)
            print(f"capacity overflow ({e}); re-planning with 1.5x budgets")
            if hasattr(sampler, "close"):
                sampler.close()
            sampler = build_sampler(caps)
            continue
        acc = correct / max(total, 1)
        loss_v = float(loss)
        dt = time.perf_counter() - t0
        if profiling:
            jax.profiler.stop_trace()
            profiling = False
            print(f"profiler trace -> {args.profile_dir}")
        print(f"epoch {epoch}: loss={loss_v:.4f} acc={acc:.4f} "
              f"time={dt:.2f}s [{timers.summary()}]")
        last_phases = {k: round(v, 4) for k, v in timers.as_dict().items()}
        timers.clear()
        if args.save_dir and jax.process_index() == 0:
            from occ_gnn_tpu.utils.checkpoint import save_checkpoint

            path = save_checkpoint(
                f"{args.save_dir}/split_epoch.npz", params, opt_state,
                epoch + 1,
            )
            print(f"checkpoint -> {path}")
        epoch += 1
    import resource

    out = {"mode": "split", "acc": acc, "loss": loss_v, "partitions": P,
           "phases": locals().get("last_phases", {}),
           # Per-process peak RSS: in --distributed runs this shows each
           # host carrying ~1/num_hosts of the cache/slicing state.
           "peak_rss_mb": round(
               resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
           )}
    if args.sampler == "native" and hasattr(sampler, "stats"):
        st = sampler.stats()
        out["phases"]["cxx_sample"] = round(st["sample_s_per_batch"], 4)
        out["phases"]["cxx_slice"] = round(st["slice_s_per_batch"], 4)
    if args.eval and g.val_mask is not None:
        from occ_gnn_tpu.parallel.model import make_split_forward

        fwd = make_split_forward(model, mesh, csr=csr)
        ev_key = jax.random.PRNGKey(args.seed + 13)
        ev_step = 0
        for split_name, mask in (("val", g.val_mask), ("test", g.test_mask)):
            nodes = np.nonzero(mask)[0]
            # Same sampler backend as training (native C++ service or numpy)
            # so eval shares its perf and RNG source.
            ev = build_sampler(caps, nodes=nodes, seed=args.seed + 7)
            correct = total = 0
            for batch in ev:
                if cache is not None:
                    xs = cache.frames
                else:
                    xs = _gather_xs(g, batch, P, multihost,
                                    mesh if multihost else None)
                if csr is not None:
                    logits = fwd(params, batch, xs,
                                 sample_rng=jax.random.fold_in(
                                     ev_key, ev_step))
                    ev_step += 1
                else:
                    logits = fwd(params, batch, xs)
                # jnp ops throughout: labels/logits are global sharded
                # arrays under --distributed (not host-readable via numpy).
                labels = batch.labels
                pred = jnp.argmax(logits, axis=-1)
                valid = labels >= 0
                correct += int(jnp.sum(jnp.where(valid, pred == labels, 0)))
                total += int(jnp.sum(valid))
            if hasattr(ev, "close"):
                ev.close()
            out[f"{split_name}_acc"] = correct / max(total, 1)
            print(f"{split_name} accuracy: {out[f'{split_name}_acc']:.4f}")
    return out


def train_ddp(args, g, fanouts, timers):
    import jax
    import jax.numpy as jnp
    import optax

    from occ_gnn_tpu.parallel.dp import make_dp_train_step, stack_batches
    from occ_gnn_tpu.parallel.split import make_mesh
    from occ_gnn_tpu.sampling.neighbor import NeighborSampler, plan_capacities
    from occ_gnn_tpu.training import gather_features

    P = args.partitions or len(jax.devices())
    mesh = make_mesh(P)
    model = _make_model(args, g, split=False)
    params = model.init(jax.random.PRNGKey(args.seed))
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)
    step = make_dp_train_step(model, opt, mesh)

    nodes = _train_nodes(args, g)
    per_dev = args.batch_size // P
    if args.measure_caps:
        from occ_gnn_tpu.sampling.neighbor import measure_capacities

        caps = measure_capacities(
            g, nodes, fanouts, per_dev, seed=args.seed + 99,
            replace=not args.sample_without_replacement,
        )
    else:
        caps = plan_capacities(per_dev, fanouts, g.num_nodes)
    shards = np.array_split(np.random.default_rng(args.seed).permutation(nodes), P)
    samplers = [
        NeighborSampler(g, shards[p], fanouts, per_dev, capacities=caps,
                        seed=args.seed + p, drop_last=True)
        for p in range(P)
    ]
    acc = loss_v = 0.0
    drop_key = (jax.random.PRNGKey(args.seed ^ 0x5EED)
                if args.dropout > 0 else None)
    gstep = 0
    for epoch in range(args.num_epochs):
        t0 = time.perf_counter()
        correct = total = 0
        iters = [iter(s) for s in samplers]
        steps = min(len(s) for s in samplers)
        for _ in range(steps):
            with timers.phase("sample"):
                batches = [next(it) for it in iters]
                stacked = stack_batches(batches)
            with timers.phase("feature_gather"):
                x0 = jnp.stack([
                    gather_features(g.features, b.input_nodes)
                    for b in batches
                ])
            with timers.phase("train_step"):
                params, opt_state, loss, c, t = step(
                    params, opt_state, stacked, x0,
                    rng=(jax.random.fold_in(drop_key, gstep)
                         if drop_key is not None else None),
                )
                gstep += 1
                loss = jax.block_until_ready(loss)
            correct += int(c)
            total += int(t)
        acc = correct / max(total, 1)
        loss_v = float(loss)
        dt = time.perf_counter() - t0
        print(f"epoch {epoch}: loss={loss_v:.4f} acc={acc:.4f} "
              f"time={dt:.2f}s [{timers.summary()}]")
        last_phases = {k: round(v, 4) for k, v in timers.as_dict().items()}
        timers.clear()
    return {"mode": "ddp", "acc": acc, "loss": loss_v, "partitions": P,
            "phases": locals().get("last_phases", {})}


def train_quiver(args, g, fanouts, timers):
    """Quiver-baseline analog: device-side dense sampling, replicated
    feature table, DP psum (reference python/quiver-baseline.py:139-163).
    The whole step is one XLA program — the host only feeds target ids."""
    import jax
    import jax.numpy as jnp
    import optax

    from occ_gnn_tpu.models import SAGEModel
    from occ_gnn_tpu.parallel.split import make_mesh
    from occ_gnn_tpu.sampling.device_sampler import DeviceSampleTrainer

    if args.model_name != "sage":
        raise SystemExit("--mode quiver supports --model-name sage "
                         "(the reference quiver baseline is SAGE-only)")
    P = args.partitions or len(jax.devices())
    mesh = make_mesh(P)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = SAGEModel(g.feature_dim, args.num_hidden, g.num_classes,
                      len(fanouts), dropout=args.dropout, dtype=dtype)
    params = model.init(jax.random.PRNGKey(args.seed))
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)
    drv = DeviceSampleTrainer(
        g, fanouts, args.batch_size, mesh, opt, seed=args.seed,
        dropout_rate=args.dropout, dtype=dtype,
    )
    nodes = _train_nodes(args, g)
    acc = loss_v = 0.0
    for epoch in range(args.num_epochs):
        t0 = time.perf_counter()
        with timers.phase("fused_step"):
            params, opt_state, loss_v, correct, total = drv.train_epoch(
                params, opt_state, nodes
            )
        acc = correct / max(total, 1)
        dt = time.perf_counter() - t0
        print(f"epoch {epoch}: loss={loss_v:.4f} acc={acc:.4f} "
              f"time={dt:.2f}s [{timers.summary()}]")
        last_phases = {k: round(v, 4) for k, v in timers.as_dict().items()}
        timers.clear()
    return {"mode": "quiver", "acc": acc, "loss": loss_v, "partitions": P,
            "phases": locals().get("last_phases", {})}


def train_single(args, g, fanouts, timers, use_cache: bool):
    import jax
    import optax

    from occ_gnn_tpu.cache import SingleChipCache
    from occ_gnn_tpu.sampling.neighbor import NeighborSampler
    from occ_gnn_tpu.training import (
        gather_features,
        make_train_step,
    )

    model = _make_model(args, g, split=False)
    params = model.init(jax.random.PRNGKey(args.seed))
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)
    step = make_train_step(model, opt)
    nodes = _train_nodes(args, g)
    caps = None
    if args.measure_caps:
        from occ_gnn_tpu.sampling.neighbor import measure_capacities

        with timers.phase("capacity_plan"):
            caps = measure_capacities(
                g, nodes, fanouts, args.batch_size, seed=args.seed + 99,
                replace=not args.sample_without_replacement,
            )
    sampler = NeighborSampler(g, nodes, fanouts, args.batch_size,
                              capacities=caps, seed=args.seed)
    cache = None
    if use_cache:
        from occ_gnn_tpu.cache.autosize import resolve_cache_percentage

        pct = resolve_cache_percentage(
            args.cache_per, g, np.zeros(g.num_nodes, np.int32), 1,
            dtype_bytes=2 if args.dtype == "bfloat16" else 4,
            refresh_cap=0,
        )
        if pct <= 0:
            pct = 0.25  # the reference pa_cache default
        cache = SingleChipCache(g, min(pct, 1.0),
                                sampler.caps["frame_caps"][0])
    rng = jax.random.PRNGKey(args.seed)
    acc = loss_v = 0.0
    for epoch in range(args.num_epochs):
        t0 = time.perf_counter()
        correct = total = 0
        for batch in sampler:
            with timers.phase("feature_load"):
                if cache is not None:
                    x0 = cache.load_input_frame(np.asarray(batch.input_nodes))
                else:
                    x0 = gather_features(g.features, batch.input_nodes)
            rng, sub = jax.random.split(rng)
            with timers.phase("train_step"):
                params, opt_state, loss, c, t = step(
                    params, opt_state, batch, x0, sub
                )
                loss = jax.block_until_ready(loss)
            correct += int(c)
            total += int(t)
        acc = correct / max(total, 1)
        loss_v = float(loss)
        dt = time.perf_counter() - t0
        hit = f" hit_rate={cache.hit_rate:.3f}" if cache else ""
        print(f"epoch {epoch}: loss={loss_v:.4f} acc={acc:.4f} "
              f"time={dt:.2f}s{hit} [{timers.summary()}]")
        last_phases = {k: round(v, 4) for k, v in timers.as_dict().items()}
        timers.clear()
    out = {"mode": "pa-cache" if use_cache else "single", "acc": acc,
           "loss": loss_v, "phases": locals().get("last_phases", {})}
    if cache:
        out["hit_rate"] = cache.hit_rate
    return out


if __name__ == "__main__":
    main()
