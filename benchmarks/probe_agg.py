"""One-off probe: dense fanout-K aggregation variants at bench shapes.

Dependency-chained via fori_loop so the tunnel/async can't hide latency.
"""

import os
import sys
import time

import numpy as np


def main():
    import jax

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    S, D, K, H = 229025, 84680, 26, 100
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((S, H)), dtype=jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, S - 1, (K, D)), dtype=jnp.int32)

    def agg_unrolled(x, nbr_idx):
        acc = x[nbr_idx[0]].astype(jnp.float32)
        for k in range(1, K):
            acc = acc + x[nbr_idx[k]].astype(jnp.float32)
        return acc

    def agg_flat(x, nbr_idx):
        flat = x[nbr_idx.reshape(-1)]
        return flat.reshape(K, D, H).astype(jnp.float32).sum(0)

    def make_tiled(tile):
        def agg(x, nbr_idx):
            nt = -(-D // tile)
            dp = nt * tile
            pad = jnp.pad(nbr_idx, ((0, 0), (0, dp - D)),
                          constant_values=S - 1)
            tiles = pad.reshape(K, nt, tile).transpose(1, 0, 2)

            def body(_, idx_t):
                acc = x[idx_t[0]].astype(jnp.float32)
                for k in range(1, K):
                    acc = acc + x[idx_t[k]].astype(jnp.float32)
                return None, acc

            _, out = jax.lax.scan(body, None, tiles)
            return out.reshape(dp, H)[:D]
        return agg

    def agg_none(x, nbr_idx):
        return x[:D].astype(jnp.float32) * 2.0

    variants = {
        "none (x[:D] copy)": agg_none,
        "unrolled K chain": agg_unrolled,
        "flat gather+sum": agg_flat,
        "tiled scan 4096": make_tiled(4096),
        "tiled scan 8192": make_tiled(8192),
        "tiled scan 16384": make_tiled(16384),
    }

    N = 10
    for name, agg in variants.items():
        @jax.jit
        def run(x, nbr_idx, agg=agg):
            def body(i, x):
                y = agg(x, nbr_idx)
                return x.at[0, 0].add((y[0, 0] * 1e-30).astype(x.dtype))
            return jax.lax.fori_loop(0, N, body, x)

        out = jax.block_until_ready(run(x0, idx))  # compile+warm
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(x0, idx))
        dt = (time.perf_counter() - t0) / N
        bw = K * D * H * 2 / dt / 1e9
        print(f"{name:22s} {dt * 1e3:8.2f} ms   ({bw:6.1f} GB/s gather-eq)")


if __name__ == "__main__":
    main()
