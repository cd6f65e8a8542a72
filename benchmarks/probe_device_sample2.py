"""Device-innermost synthesis variants, measured FUSED (round 5).

probe_device_sample's standalone micro-jits are unreliable through this
harness's TPU relay (agg_consume measured 182 then 572 ms across runs;
the real full step containing the same work is 90.7 ms total). Variants
here are timed as ONE jit: synthesize -> consume (26-row-gather
aggregation) -> scalar, which matches the in-step fusion and measured
stable (full_synth 75.4/76.3 ms across runs).

Variants:
  randint_kd   v1 shipped path: jax.random.randint (integer remainder —
               emulated on the TPU VPU), K-major gather
  bitsf32_kd   random bits -> f32 multiply -> floor (no integer div)
  bitsf32_dk   + d-major element gather (the K draws of one dst share a
               ~100B adjacency span -> cache-line locality), transposed
               back for the aggregation

Run:  python -m benchmarks.probe_device_sample2 [--cpu]
Appends to benchmarks/results/device_sample.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

RESULTS = os.path.join(os.path.dirname(__file__), "results",
                       "device_sample.jsonl")


def main():
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from occ_gnn_tpu.data import random_graph

    nodes = int(os.environ.get("OCC_PROBE_NODES", 2_450_000))
    g = random_graph(num_nodes=nodes, avg_degree=25, feature_dim=100,
                     num_classes=47, seed=0).pad_feature_dim(128)
    D = int(os.environ.get("OCC_PROBE_D", 126_384))
    K = 25
    rng = np.random.default_rng(0)
    dst = rng.choice(g.num_nodes, size=D, replace=False).astype(np.int32)
    indptr = jnp.asarray(np.asarray(g.indptr, np.int32))
    indices = jnp.asarray(np.asarray(g.indices, np.int32))
    frames = jnp.asarray(
        rng.standard_normal((g.num_nodes + 1, 128)).astype(np.float32)
    ).astype(jnp.bfloat16)
    dstj = jnp.asarray(dst)
    key = jax.random.PRNGKey(0)
    zero_row = g.num_nodes  # reserved row

    def consume(nbr):
        acc = frames[nbr[0]].astype(jnp.float32)
        for k in range(1, K):
            acc = acc + frames[nbr[k]].astype(jnp.float32)
        return acc.sum()

    def common(dg):
        valid = dg >= 0
        gsafe = jnp.maximum(dg, 0)
        off = indptr[gsafe]
        deg = jnp.where(valid, indptr[gsafe + 1] - off, 0)
        take = jnp.minimum(deg, K)
        return off, deg, take

    def finish(src, take, order="kd"):
        kr = jnp.arange(K, dtype=jnp.int32)[:, None]
        validk = kr < take[None, :]
        return jnp.where(validk, src, zero_row)

    @jax.jit
    def randint_kd(key, dg):
        off, deg, take = common(dg)
        kr = jnp.arange(K, dtype=jnp.int32)[:, None]
        r = jax.random.randint(key, (K, D), 0,
                               jnp.maximum(deg, 1)[None, :],
                               dtype=jnp.int32)
        sel = jnp.where(deg[None, :] > K, r, kr)
        src = indices[off[None, :] + sel]
        return consume(finish(src, take))

    def bits_sel_kd(key, deg):
        bits = jax.random.bits(key, (K, D), dtype=jnp.uint32)
        u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
        r = jnp.minimum(
            jnp.floor(u * deg.astype(jnp.float32)[None, :]).astype(
                jnp.int32),
            jnp.maximum(deg - 1, 0)[None, :],
        )
        kr = jnp.arange(K, dtype=jnp.int32)[:, None]
        return jnp.where(deg[None, :] > K, r, kr)

    @jax.jit
    def bitsf32_kd(key, dg):
        off, deg, take = common(dg)
        sel = bits_sel_kd(key, deg)
        src = indices[off[None, :] + sel]
        return consume(finish(src, take))

    @jax.jit
    def bitsf32_dk(key, dg):
        off, deg, take = common(dg)
        sel = bits_sel_kd(key, deg)
        src = indices[off[:, None] + sel.T].T
        return consume(finish(src, take))

    def timeit(fn, reps=10):
        out = fn(key, dstj)
        _ = float(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(key, dstj)
        _ = float(out)
        return (time.perf_counter() - t0) / reps

    @jax.jit
    def consume_only(key, dg):
        # baseline: aggregation over a synthesis-free nbr (random rows
        # derived from dg alone) — the subtraction target
        kr = jnp.arange(K, dtype=jnp.int32)[:, None]
        nbr = jnp.where(kr < 20,
                        (jnp.abs(dg)[None, :] * (kr + 1)) % g.num_nodes,
                        zero_row)
        return consume(nbr)

    rec = {
        "bench": "device_sample_fused",
        "platform": jax.devices()[0].platform,
        "D": D, "K": K, "nodes": g.num_nodes, "edges": g.num_edges,
        "consume_only_ms": round(timeit(consume_only) * 1e3, 2),
        "randint_kd_ms": round(timeit(randint_kd) * 1e3, 2),
        "bitsf32_kd_ms": round(timeit(bitsf32_kd) * 1e3, 2),
        "bitsf32_dk_ms": round(timeit(bitsf32_dk) * 1e3, 2),
    }
    print(json.dumps(rec))
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    with open(RESULTS, "a") as fp:
        fp.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
