"""One-off probe: XLA cost analysis of the flagship step at bench shapes."""

import os

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
    it = iter(sampler)
    b0 = next(it)
    frames = cache.frames
    sampler.close()

    for lyr in b0.layers:
        print("layer caps: src", lyr.src_cap, "dst", lyr.dst_cap,
              "out", lyr.out_cap, "edges", lyr.edge_src.shape,
              "nbr_idx", None if lyr.nbr_idx is None else lyr.nbr_idx.shape)
    print("frames", jax.tree_util.tree_map(lambda a: a.shape, frames))

    lowered = step.lower(params, opt_state, b0, frames)
    compiled = lowered.compile()
    import sys
    if "--dump-hlo" in sys.argv:
        with open("/tmp/step_hlo.txt", "w") as fh:
            fh.write(compiled.as_text())
        print("HLO written to /tmp/step_hlo.txt")
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    keys = ["flops", "bytes accessed", "transcendentals",
            "utilization operand 0 {}", "optimal_seconds"]
    for k in sorted(ca):
        if "bytes" in k or k in ("flops", "optimal_seconds"):
            print(f"{k}: {ca[k]:.3e}")


if __name__ == "__main__":
    main()
