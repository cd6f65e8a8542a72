"""On-chip cross-check of the bench roofline's phase attribution.

VERDICT r2 weak item: bench.py's roofline is a hand model from padded
capacities claiming dense fanout-K aggregation is ~75% of the products
step, and no on-chip profile verified it (the checked-in trace is from
the CPU mesh; the JAX profiler server is not reachable through the axon
tunnel).  This probe measures the attribution directly on the chip by
DIFFERENCING jitted program variants over the SAME staged products-scale
batches:

  full        the production train step (fwd + bwd + adam)
  grad        forward + backward only
  grad_noagg  same, with `aggregate` ablated to a one-row broadcast
              (linears, owned-slicing, shapes, layouts all unchanged)
  fwd         forward + loss only
  fwd_noagg   ablated forward + loss
  agg_iso     the aggregation chain alone at the forward's exact
              shapes/dtypes (random frames, gather traffic identical)

Aggregation share of the step = (grad - grad_noagg) / full (covers the
forward gathers AND the backward scatter of the same volume); the
forward-only share and the isolated chain bound it from both sides.

Config mirrors bench.py exactly (same graph seed, measured capacities at
the same margin, bf16 storage) so the step program hits the same compile
cache and the numbers are directly comparable to the bench record.
Writes one JSON record to benchmarks/results/step_phases.jsonl.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from occ_gnn_tpu.cache import CachePlan, SplitFeatureCache
    from occ_gnn_tpu.data import random_graph
    from occ_gnn_tpu.models.common import linear
    from occ_gnn_tpu.parallel.model import (
        SplitSAGE,
        _local_ce,
        _unstack,
        make_split_forward,
        make_split_train_step,
    )
    from occ_gnn_tpu.parallel.split import (
        aggregate,
        make_mesh,
        slice_owned,
    )
    from occ_gnn_tpu.sampling.native import NativeSplitSampler
    from occ_gnn_tpu.sampling.slicer import (
        measure_split_capacities,
        plan_split_capacities,
    )

    dtype = jnp.bfloat16
    P = 1
    num_nodes = int(os.environ.get("OCC_BENCH_NODES", 2_450_000))
    avg_degree = int(os.environ.get("OCC_BENCH_DEGREE", 25))
    hidden = 128
    g = random_graph(num_nodes=num_nodes, avg_degree=avg_degree,
                     feature_dim=100, num_classes=47, seed=0)
    g = g.pad_feature_dim(128)
    pmap = np.zeros(g.num_nodes, dtype=np.int32)
    fanouts = [10, 10, 25]
    batch_size = 1024
    cache_pct = 0.25

    safe = plan_split_capacities(batch_size, fanouts, g.num_nodes, P)
    probe = CachePlan(g, pmap, P, cache_pct,
                      refresh_cap=safe["frame_caps"][0])
    margin = float(os.environ.get("OCC_BENCH_MARGIN", 1.5))
    caps = measure_split_capacities(
        g, g.train_nodes(), pmap, P, fanouts, batch_size, num_batches=3,
        margin=margin, seed=1, cache_plan=probe,
    )
    plan = CachePlan(g, pmap, P, cache_pct,
                     refresh_cap=max(caps.pop("refresh_cap", 8), 8))
    cache = SplitFeatureCache(plan, dtype=dtype)
    sampler = NativeSplitSampler(
        g, g.train_nodes(), pmap, P, fanouts, batch_size,
        capacities=caps, seed=0, cache=cache, num_workers=1,
        drop_last=True,
    )

    mesh = make_mesh(P)
    model = SplitSAGE(g.feature_dim, hidden, g.num_classes, 3, dtype=dtype)

    class NoAggSAGE(SplitSAGE):
        """Aggregation ablated: the neighbor frame becomes a one-row
        broadcast (a single gather — negligible HBM traffic) while every
        other op (owned-slice, concat, matmul, mask, dtypes, shapes)
        stays bit-identical in structure to SplitSAGE.layer."""

        def layer(self, params, lyr, x):
            neigh = jnp.broadcast_to(
                x[:1].astype(jnp.float32), (lyr.dst_cap, x.shape[-1])
            )
            self_x, neigh_mean, mask = slice_owned(neigh, lyr, x)
            h = linear(params, jnp.concatenate([self_x, neigh_mean],
                                               axis=-1))
            return h * mask

    noagg = NoAggSAGE(g.feature_dim, hidden, g.num_classes, 3, dtype=dtype)

    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_split_train_step(model, opt, mesh)

    def make_fwd_loss(m):
        fwd = make_split_forward(m, mesh)

        @jax.jit
        def fwd_loss(params, batch, frames):
            logits = fwd(params, batch, frames)
            nll, cnt, _ = _local_ce(
                logits.reshape(-1, logits.shape[-1]),
                batch.labels.reshape(-1),
            )
            return nll / jnp.maximum(cnt, 1)

        return fwd_loss

    fwd_loss = make_fwd_loss(model)
    fwd_loss_noagg = make_fwd_loss(noagg)
    grad_fn = jax.jit(jax.grad(fwd_loss))
    grad_fn_noagg = jax.jit(jax.grad(fwd_loss_noagg))

    # Isolated aggregation chain at the forward's exact frame shapes:
    # layer l consumes an [src_cap_l, dim_l] bf16 frame (dim_0 = padded
    # feature dim, deeper = hidden) and runs the SAME `aggregate` the
    # production layer runs. Returns a dependent scalar for the
    # tunnel-safe sync.
    @jax.jit
    def agg_iso(batch, xs):
        tot = jnp.float32(0)
        for lyr, x in zip([_unstack(l) for l in batch.layers], xs):
            nb = aggregate(x, lyr)
            tot = tot + nb[0, 0]
        return tot

    it = iter(sampler)
    nstage = int(os.environ.get("OCC_BENCH_NSTAGE", 8))
    staged = [next(it) for _ in range(nstage)]
    frames = cache.frames
    sampler.close()

    dims = [g.feature_dim, hidden, hidden]
    rng = np.random.default_rng(0)
    xs = [
        jax.device_put(
            rng.standard_normal(
                (_unstack(l).src_cap, d), dtype=np.float32
            ).astype(dtype)
        )
        for l, d in zip(staged[0].layers, dims)
    ]

    def timeit(name, fn, *extra):
        out = fn(staged[0], *extra)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(leaf.reshape(-1)[0])  # tunnel-safe sync
        t0 = time.perf_counter()
        for b in staged:
            out = fn(b, *extra)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(leaf.reshape(-1)[0])
        dt = (time.perf_counter() - t0) / len(staged) * 1e3
        print(f"{name:12s} {dt:8.2f} ms", flush=True)
        return dt

    t_full = timeit(
        "full",
        lambda b: step(params, opt_state, b, frames)[2],
    )
    t_grad = timeit("grad", lambda b: grad_fn(params, b, frames))
    t_grad_na = timeit("grad_noagg",
                       lambda b: grad_fn_noagg(params, b, frames))
    t_fwd = timeit("fwd", lambda b: fwd_loss(params, b, frames))
    t_fwd_na = timeit("fwd_noagg",
                      lambda b: fwd_loss_noagg(params, b, frames))
    t_agg = timeit("agg_iso", agg_iso, xs)

    rec = {
        "experiment": "step_phases",
        "time": time.time(),
        "platform": jax.devices()[0].platform,
        "graph": f"{g.num_nodes}n/{g.num_edges}e/synthetic",
        "model": "sage",
        "storage_dtype": "bfloat16",
        "full_ms": round(t_full, 2),
        "grad_ms": round(t_grad, 2),
        "grad_noagg_ms": round(t_grad_na, 2),
        "fwd_ms": round(t_fwd, 2),
        "fwd_noagg_ms": round(t_fwd_na, 2),
        "agg_iso_ms": round(t_agg, 2),
        "agg_share_of_step": round((t_grad - t_grad_na) / t_full, 3),
        "fwd_agg_share_of_step": round((t_fwd - t_fwd_na) / t_full, 3),
        "agg_iso_share_of_step": round(t_agg / t_full, 3),
        "bwd_ms": round(t_grad - t_fwd, 2),
        "optimizer_ms": round(t_full - t_grad, 2),
        "note": (
            "differencing cross-check of the bench roofline's phase "
            "attribution (profiler unreachable through the tunnel): "
            "agg_share = (grad - grad_noagg)/full covers forward "
            "gathers + backward scatter; fwd_agg and agg_iso bound the "
            "forward side"
        ),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "step_phases.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    main()
