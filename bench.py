"""Headline benchmark: single-chip GraphSAGE training-step throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: edges/s/chip through the full jit'd training step (forward SpMM
stack + backward + adam) on a products-like synthetic graph, 3-layer
GraphSAGE fanout [10,10,25], batch 1024, hidden 128 — the reference's
flagship config (train.py defaults: fan-out '10,10,25', batch 1032,
exp6 h=128).

Baseline: the reference's OCC split-parallel epoch on ogbn-products
processes ~637M sampled edges (190 batches x ~3.35M edges) in
fwd 6.997s + move 11.58s + slice 141.8s on 4x M40
(/root/reference/experiments/exp6/exp6.txt:23, BASELINE.md) —
compute+move only (the part our jit step covers): 637M / 18.6s / 4 GPUs
= 8.6M edges/s/GPU. vs_baseline = ours / 8.6M.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_EDGES_PER_S_PER_GPU = 8.6e6


def main():
    import jax

    from occ_gnn_tpu.data import random_graph
    from occ_gnn_tpu.models import SAGEModel
    from occ_gnn_tpu.sampling.neighbor import NeighborSampler
    from occ_gnn_tpu.training import gather_features, make_train_step
    import optax

    # Products-like synthetic: sampling cost scales with batch, not |V|;
    # kept modest so host-side sampling isn't the bottleneck of the bench.
    g = random_graph(
        num_nodes=200_000, avg_degree=15, feature_dim=100, num_classes=47,
        seed=0,
    )
    fanouts = [10, 10, 25]
    batch_size = 1024
    model = SAGEModel(g.feature_dim, 128, g.num_classes, 3)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_train_step(model, opt)

    sampler = NeighborSampler(g, g.train_nodes(), fanouts, batch_size,
                              seed=0, drop_last=True)
    it = iter(sampler)
    batches = [next(it) for _ in range(4)]
    feats = [gather_features(g.features, b.input_nodes) for b in batches]
    edges_per_batch = [
        sum(int(blk.num_edges) for blk in b.blocks) for b in batches
    ]
    rng = jax.random.PRNGKey(0)

    # Warmup/compile.
    params, opt_state, loss, _, _ = step(params, opt_state, batches[0],
                                         feats[0], rng)
    jax.block_until_ready(loss)

    iters = 20
    t0 = time.perf_counter()
    edges = 0
    for i in range(iters):
        k = i % len(batches)
        params, opt_state, loss, _, _ = step(
            params, opt_state, batches[k], feats[k], rng
        )
        edges += edges_per_batch[k]
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    eps = edges / dt
    print(json.dumps({
        "metric": "sage_train_step_edges_per_s_per_chip",
        "value": round(eps, 1),
        "unit": "edges/s",
        "vs_baseline": round(eps / BASELINE_EDGES_PER_S_PER_GPU, 3),
    }))


if __name__ == "__main__":
    main()
