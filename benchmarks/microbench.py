"""TPU building-block microbenchmarks — the analog of the reference's gpu/
characterization study (/root/reference/gpu/README.md: p2p, bandwidth,
sort, memcpy probes that informed the GSplit design). These measure the
primitives the split-parallel pipeline is built from:

    python -m benchmarks.microbench [--cpu]

  h2d        host->device feature-frame transfer bandwidth
  gather     random row gather (the SpMM front half)
  segsum     sorted segment-sum (the SpMM back half)
  spmm       fused gather+segment-sum fwd and bwd
  a2a        all_to_all latency/bandwidth over the mesh axis
  scatter1   scatter-add merge (the shuffle epilogue)
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _timeit(fn, *args, reps=10):
    """Elision-proof timing: on relayed/async backends block_until_ready
    can return before remote execution completes, and identical repeated
    programs may be memoized. A device->host fetch of a scalar that
    DEPENDS on every rep's output is the only reliable sync point."""
    import jax
    import jax.numpy as jnp

    def scalar_of(o):
        leaves = jax.tree_util.tree_leaves(o)
        return jnp.asarray(leaves[0]).ravel()[0].astype(jnp.float32)

    out = fn(*args)
    float(scalar_of(out))  # warmup + compile (incl. the sync program)
    t0 = time.perf_counter()
    acc = None
    for _ in range(reps):
        out = fn(*args)
        s = scalar_of(out)
        acc = s if acc is None else acc + s
    float(acc)  # forces completion of all reps
    return (time.perf_counter() - t0) / reps


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--rows", type=int, default=300_000)
    p.add_argument("--edges", type=int, default=1_500_000)
    p.add_argument("--dst", type=int, default=90_000)
    p.add_argument("--feat", type=int, default=100)
    args = p.parse_args(argv)
    if args.cpu:
        import os

        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    S, E, D, H = args.rows, args.edges, args.dst, args.feat
    rng = np.random.default_rng(0)
    x_host = rng.standard_normal((S, H)).astype(np.float32)
    src = rng.integers(0, S, size=E).astype(np.int32)
    dst = np.sort(rng.integers(0, D, size=E)).astype(np.int32)

    results = {}

    t = _timeit(lambda a: jax.device_put(a), x_host, reps=5)
    results["h2d_GBps"] = round(x_host.nbytes / t / 1e9, 2)

    x = jnp.asarray(x_host)
    srcj, dstj = jnp.asarray(src), jnp.asarray(dst)

    gather = jax.jit(lambda x: x[srcj])
    t = _timeit(gather, x)
    results["gather_GBps"] = round(E * H * 4 / t / 1e9, 2)

    segsum = jax.jit(lambda m: jax.ops.segment_sum(
        m, dstj, num_segments=D, indices_are_sorted=True))
    msgs = gather(x)
    t = _timeit(segsum, msgs)
    results["segsum_GBps"] = round(E * H * 4 / t / 1e9, 2)

    spmm = jax.jit(lambda x: jax.ops.segment_sum(
        x[srcj], dstj, num_segments=D, indices_are_sorted=True))
    t = _timeit(spmm, x)
    results["spmm_fwd_ms"] = round(t * 1e3, 2)
    results["spmm_fwd_Medges_s"] = round(E / t / 1e6, 1)

    spmm_bwd = jax.jit(jax.grad(lambda x: spmm(x).sum()))
    t = _timeit(spmm_bwd, x)
    results["spmm_bwd_ms"] = round(t * 1e3, 2)

    # scatter-add merge: K rows into D rows
    K = min(D // 4, 8192)
    idx = jnp.asarray(rng.integers(0, D, size=K).astype(np.int32))
    upd = jnp.asarray(rng.standard_normal((K, H)).astype(np.float32))
    base = segsum(msgs)
    scat = jax.jit(lambda b, u: b.at[idx].add(u, mode="drop"))
    t = _timeit(scat, base, upd)
    results["scatter_merge_ms"] = round(t * 1e3, 3)

    # all_to_all over the device mesh (needs >1 device)
    ndev = len(jax.devices())
    if ndev > 1:
        from jax.sharding import PartitionSpec as PS

        mesh = jax.sharding.Mesh(np.array(jax.devices()), ("p",))
        S_cap = 4096
        buf = jnp.zeros((ndev, ndev, S_cap, H), jnp.float32)

        def body(b):
            return jax.lax.all_to_all(
                b[0], "p", split_axis=0, concat_axis=0, tiled=True
            )[None]

        a2a = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(PS("p"),), out_specs=PS("p"),
            check_vma=False,
        ))
        t = _timeit(a2a, buf)
        payload = ndev * ndev * S_cap * H * 4
        results["all_to_all_ms"] = round(t * 1e3, 3)
        results["all_to_all_GBps"] = round(payload / t / 1e9, 2)

    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
