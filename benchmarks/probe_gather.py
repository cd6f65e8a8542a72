"""One-off probe: TPU gather bandwidth at flagship-bench shapes.

Times (a) HBM stream copy, (b) random row gather, (c) the dense fanout-K
aggregate, (d) same with summed one-gather formulation — to localize the
forward-pass cost of the flagship step.
"""

import os
import time

import numpy as np


def main():
    import jax

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    S, D, K, H = 160_000, 100_000, 26, 100
    rng = np.random.default_rng(0)
    x16 = jnp.asarray(rng.standard_normal((S, H)), dtype=jnp.bfloat16)
    x32 = x16.astype(jnp.float32)
    idx = jnp.asarray(rng.integers(0, S, (K, D)), dtype=jnp.int32)

    def timeit(name, fn, *args, bytes_moved=None, n=20):
        out = jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        bw = f"  {bytes_moved / dt / 1e9:7.1f} GB/s" if bytes_moved else ""
        print(f"{name:28s} {dt * 1e3:8.2f} ms{bw}")
        return dt

    copy = jax.jit(lambda x: x + 1)
    timeit("stream copy bf16 [S,H]", copy, x16,
           bytes_moved=2 * S * H * 2)

    g1 = jax.jit(lambda x, i: x[i[0]])
    timeit("1 gather bf16 [D,H]", g1, x16, idx, bytes_moved=D * H * 2)

    def dense(x, i):
        acc = x[i[0]].astype(jnp.float32)
        for k in range(1, K):
            acc = acc + x[i[k]].astype(jnp.float32)
        return acc

    timeit("dense K-gather bf16", jax.jit(dense), x16, idx,
           bytes_moved=K * D * H * 2)
    timeit("dense K-gather f32", jax.jit(dense), x32, idx,
           bytes_moved=K * D * H * 4)

    flat = jax.jit(
        lambda x, i: x[i.reshape(-1)]
        .reshape(K, D, H).astype(jnp.float32).sum(0)
    )
    timeit("flat gather+reshape+sum", flat, x16, idx,
           bytes_moved=K * D * H * 2)

    flat2 = jax.jit(
        lambda x, i: x[i.T.reshape(-1)]
        .reshape(D, K, H).astype(jnp.float32).sum(1)
    )
    timeit("d-major gather+sum", flat2, x16, idx,
           bytes_moved=K * D * H * 2)


if __name__ == "__main__":
    main()
