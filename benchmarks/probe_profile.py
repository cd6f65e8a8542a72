"""One-off probe: jax.profiler trace of the flagship step; parse per-op times."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np


def run_trace(outdir):
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
    staged = [next(it) for _ in range(4)]
    frames = cache.frames
    sampler.close()

    # warm
    p, s = params, opt_state
    p, s, loss, _, _ = step(p, s, staged[0], frames)
    jax.block_until_ready(loss)

    with jax.profiler.trace(outdir):
        for b in staged:
            p, s, loss, _, _ = step(p, s, b, frames)
        jax.block_until_ready(loss)
    print("trace written to", outdir)


def parse(outdir):
    files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
    if not files:
        print("NO TRACE FILES under", outdir)
        return
    f = max(files, key=os.path.getmtime)
    print("parsing", f)
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    # device lanes: pid names containing TPU/device
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dur_by_name = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "tpu" not in pname and "/device" not in pname:
            continue
        name = e.get("name", "?")
        dur_by_name[name] += e.get("dur", 0)
        cnt[name] += 1
        total += e.get("dur", 0)
    print(f"total device op time: {total/1e3:.2f} ms over 4 steps")
    for name, d in sorted(dur_by_name.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{d/1e3:9.2f} ms  x{cnt[name]:3d}  {name[:90]}")
    if not dur_by_name:
        print("pids seen:", pid_names)


if __name__ == "__main__":
    out = "/tmp/jxprof"
    if "--parse-only" not in sys.argv:
        run_trace(out)
    parse(out)
