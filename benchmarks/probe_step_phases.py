"""One-off probe: split the flagship step's time into fwd / fwd+bwd / full.

Runs the same staged-batch loop as bench.py but times three jitted
variants to localize the remaining per-step cost (TPU tunnel, 1 chip).
"""

from __future__ import annotations

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
    from occ_gnn_tpu.parallel.model import SplitSAGE, make_split_train_step
    from occ_gnn_tpu.parallel.split import make_mesh
    from occ_gnn_tpu.sampling.native import NativeSplitSampler
    from occ_gnn_tpu.sampling.slicer import (
        measure_split_capacities,
        plan_split_capacities,
    )

    dtype = jnp.bfloat16
    P = 1
    g = random_graph(num_nodes=200_000, avg_degree=15, feature_dim=100,
                     num_classes=47, seed=0)
    pmap = np.zeros(g.num_nodes, dtype=np.int32)
    fanouts = [10, 10, 25]
    batch_size = 1024
    safe = plan_split_capacities(batch_size, fanouts, g.num_nodes, P)
    probe = CachePlan(g, pmap, P, 0.25, refresh_cap=safe["frame_caps"][0])
    caps = measure_split_capacities(
        g, g.train_nodes(), pmap, P, fanouts, batch_size, num_batches=3,
        margin=1.5, seed=1, cache_plan=probe,
    )
    plan = CachePlan(g, pmap, P, 0.25,
                     refresh_cap=max(caps.pop("refresh_cap", 8), 8))
    cache = SplitFeatureCache(plan, dtype=dtype)
    sampler = NativeSplitSampler(
        g, g.train_nodes(), pmap, P, fanouts, batch_size,
        capacities=caps, seed=0, cache=cache, num_workers=1, drop_last=True,
    )
    mesh = make_mesh(P)
    model = SplitSAGE(g.feature_dim, 128, g.num_classes, 3, dtype=dtype)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_split_train_step(model, opt, mesh)

    from occ_gnn_tpu.parallel.model import _local_ce, make_split_forward

    fwd = make_split_forward(model, mesh)

    it = iter(sampler)
    staged = [next(it) for _ in range(8)]
    frames = cache.frames
    sampler.close()

    @jax.jit
    def fwd_loss(params, batch, frames):
        logits = fwd(params, batch, frames)
        nll, cnt, _ = _local_ce(
            logits.reshape(-1, logits.shape[-1]),
            batch.labels.reshape(-1),
        )
        return nll / jnp.maximum(cnt, 1)

    grad_fn = jax.jit(jax.grad(fwd_loss))

    def timeit(name, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for b in staged:
            out = fn(*(a if not isinstance(a, type(b)) else b for a in args))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / len(staged) * 1e3
        print(f"{name:16s} {dt:8.2f} ms")
        return dt

    b0 = staged[0]
    t_fwd = timeit("forward+loss", fwd_loss, params, b0, frames)
    t_grad = timeit("fwd+bwd", grad_fn, params, b0, frames)

    def full(params, opt_state, batch, frames):
        return step(params, opt_state, batch, frames)

    out = full(params, opt_state, b0, frames)
    jax.block_until_ready(out[2])
    t0 = time.perf_counter()
    p, s = params, opt_state
    for b in staged:
        p, s, loss, _, _ = full(p, s, b, frames)
    jax.block_until_ready(loss)
    t_full = (time.perf_counter() - t0) / len(staged) * 1e3
    print(f"{'full step':16s} {t_full:8.2f} ms")
    print(f"bwd-only ~ {t_grad - t_fwd:.2f} ms; "
          f"optimizer+metrics ~ {t_full - t_grad:.2f} ms")


if __name__ == "__main__":
    main()
