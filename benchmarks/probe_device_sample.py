"""Device-innermost synthesis cost breakdown (round 5).

The first device-innermost bench measured step 36 -> 90.7 ms — the
on-chip synthesis costs ~55 ms at products shapes (K=25 draws x
D=126384 dsts). This probe times each component on the real chip:

  rng_randint     jax.random.randint with per-dst maxval (the v1 path —
                  integer remainder is EMULATED on the TPU VPU)
  rng_bits_f32    random bits -> float multiply -> floor (Lemire-style
                  reduction in f32; deg < 2^24 so exact enough, with a
                  min() guard)
  idx_gather      the [K, D] element gather from the 61M-entry indices
  full_v1 / v2    synthesize_device_innermost with each RNG
  agg_consume     the downstream 26-row-gather aggregation (context)

Run:  python -m benchmarks.probe_device_sample        (real TPU)
      python -m benchmarks.probe_device_sample --cpu  (smoke)
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


def timeit(fn, *args, reps=10):
    out = fn(*args)
    # relay-safe sync: fetch a dependent scalar
    _ = float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / reps


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
        np.zeros((g.num_nodes + 1, 128), np.float32)
    ).astype(jnp.bfloat16)
    dstj = jnp.asarray(dst)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def rng_randint(key, dg):
        off = indptr[dg]
        deg = indptr[dg + 1] - off
        return jax.random.randint(key, (K, D), 0,
                                  jnp.maximum(deg, 1)[None, :],
                                  dtype=jnp.int32)

    @jax.jit
    def rng_bits_f32(key, dg):
        off = indptr[dg]
        deg = indptr[dg + 1] - off
        bits = jax.random.bits(key, (K, D), dtype=jnp.uint32)
        u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
        r = jnp.floor(u * deg.astype(jnp.float32)[None, :]).astype(jnp.int32)
        return jnp.minimum(r, jnp.maximum(deg - 1, 0)[None, :])

    @jax.jit
    def idx_gather(sel, dg):
        off = indptr[dg]
        return indices[off[None, :] + sel]

    @jax.jit
    def idx_gather_dk(sel, dg):
        # d-major: the K draws of one dst sit in a ~100B adjacency span,
        # so consecutive gather elements share cache lines.
        off = indptr[dg]
        return indices[off[:, None] + sel.T].T

    @jax.jit
    def rng_bits_rbg(key, dg):
        off = indptr[dg]
        deg = indptr[dg + 1] - off
        bits = jax.random.bits(jax.random.wrap_key_data(
            jnp.zeros(4, jnp.uint32), impl="rbg"), (K, D),
            dtype=jnp.uint32)
        u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
        r = jnp.floor(u * deg.astype(jnp.float32)[None, :]).astype(jnp.int32)
        return jnp.minimum(r, jnp.maximum(deg - 1, 0)[None, :])

    @jax.jit
    def agg_consume(nbr):
        acc = frames[nbr[0]].astype(jnp.float32)
        for k in range(1, K):
            acc = acc + frames[nbr[k]].astype(jnp.float32)
        return acc

    from occ_gnn_tpu.parallel.split import (
        SplitLayer,
        synthesize_device_innermost,
    )

    lyr = SplitLayer(dst_global=dstj, src_cap=g.num_nodes + 1,
                     dst_cap=D, out_cap=D, fanout=K)

    @jax.jit
    def full_v1(key):
        out = synthesize_device_innermost(lyr, indptr, indices, key)
        return out.nbr_idx

    sel0 = rng_bits_f32(key, dstj)
    rec = {
        "bench": "device_sample",
        "platform": jax.devices()[0].platform,
        "D": D, "K": K, "nodes": g.num_nodes, "edges": g.num_edges,
        "rng_randint_ms": round(timeit(rng_randint, key, dstj) * 1e3, 2),
        "rng_bits_f32_ms": round(timeit(rng_bits_f32, key, dstj) * 1e3, 2),
        "rng_bits_rbg_ms": round(timeit(rng_bits_rbg, key, dstj) * 1e3, 2),
        "idx_gather_ms": round(timeit(idx_gather, sel0, dstj) * 1e3, 2),
        "idx_gather_dk_ms": round(
            timeit(idx_gather_dk, sel0, dstj) * 1e3, 2),
        "agg_consume_ms": round(
            timeit(agg_consume, idx_gather(sel0, dstj)) * 1e3, 2),
        "full_synth_ms": round(timeit(full_v1, key) * 1e3, 2),
    }
    print(json.dumps(rec))
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    with open(RESULTS, "a") as fp:
        fp.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
