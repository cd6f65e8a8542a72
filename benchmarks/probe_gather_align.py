"""Gather-throughput probe: effective HBM bandwidth of random row gathers
as a function of row width (lane alignment), dtype, and table size.

Motivation: the products-scale bench shows the split step running at
~46-58 GB/s effective — gather-bound at XLA's random-row gather rate, far
from the 819 GB/s streaming peak. If 128-lane-aligned rows gather
significantly faster than H=100 rows, padding the feature frames to a
multiple of 128 is a free step-time win (no custom kernel needed).

    python benchmarks/probe_gather_align.py            # real TPU
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    S = 1_600_000
    E = 3_300_000
    idx = jnp.asarray(rng.integers(0, S, E, dtype=np.int64).astype(np.int32))

    rows = []
    for H in (100, 128, 256):
        for dt in ("f32", "bf16"):
            dtype = jnp.float32 if dt == "f32" else jnp.bfloat16
            x = jnp.asarray(
                rng.standard_normal((S, H)).astype(np.float32)
            ).astype(dtype)

            @jax.jit
            def gather(x, idx):
                return x[idx].sum(axis=0)  # sum avoids materializing [E,H]

            out = gather(x, idx)
            jax.block_until_ready(out)
            reps = 5
            t0 = time.perf_counter()
            for _ in range(reps):
                out = gather(x, idx)
            jax.block_until_ready(out)
            dtms = (time.perf_counter() - t0) / reps * 1e3
            bytes_read = E * H * x.dtype.itemsize
            gbps = bytes_read / (dtms / 1e3) / 1e9
            rows.append({"H": H, "dtype": dt, "ms": round(dtms, 2),
                         "GBps": round(gbps, 1)})
            print(json.dumps(rows[-1]), flush=True)
            del x

    # K-accumulate form (the actual dense-agg pattern): 26 gathers of
    # [D] rows each with f32 accumulation.
    D, K = 126_000, 26
    nbr = jnp.asarray(
        rng.integers(0, S, (K, D), dtype=np.int64).astype(np.int32)
    )
    for H in (100, 128):
        x = jnp.asarray(
            rng.standard_normal((S, H)).astype(np.float32)
        ).astype(jnp.bfloat16)

        @jax.jit
        def agg(x, nbr):
            acc = x[nbr[0]].astype(jnp.float32)
            for k in range(1, K):
                acc = acc + x[nbr[k]].astype(jnp.float32)
            return acc

        out = agg(x, nbr)
        jax.block_until_ready(out)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = agg(x, nbr)
        jax.block_until_ready(out)
        dtms = (time.perf_counter() - t0) / reps * 1e3
        bytes_read = K * D * H * 2
        rows.append({"pattern": "dense_agg_K26", "H": H, "ms": round(dtms, 2),
                     "GBps": round(bytes_read / (dtms / 1e3) / 1e9, 1)})
        print(json.dumps(rows[-1]), flush=True)
        del x

    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/gather_align.jsonl", "a") as f:
        f.write(json.dumps({"rows": rows}) + "\n")


if __name__ == "__main__":
    main()
