"""Worker process for the multi-process multihost test (run via
tests/test_multiprocess.py): joins a jax.distributed cluster of CPU
processes, runs ONE split-parallel training step with replicated
deterministic sampling, prints the psum'd loss."""

import os
import sys

proc_id = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
# "numpy": replicated numpy slicing, host slices its rows afterwards.
# "native_sharded": C++ service with emit_range — each host SLICES ONLY
# its own partitions (work ~1/num_hosts), results must stay identical.
mode = sys.argv[4] if len(sys.argv) > 4 else "numpy"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=proc_id,
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import optax

from occ_gnn_tpu.data import partition_graph, random_graph
from occ_gnn_tpu.parallel.model import SplitSAGE, make_split_train_step
from occ_gnn_tpu.parallel.multihost import (
    assemble_global,
    local_partition_range,
)
from occ_gnn_tpu.sampling.slicer import SplitSampler
from occ_gnn_tpu.training import gather_features

P = 4
g = random_graph(num_nodes=600, avg_degree=6, feature_dim=16, num_classes=4,
                 seed=3)
pmap = partition_graph(g, P, mode="greedy")
mesh = jax.sharding.Mesh(np.array(jax.devices()).reshape(P), ("p",))
lo, hi = local_partition_range(mesh)
if mode == "native_sharded":
    from occ_gnn_tpu.parallel.multihost import MultiHostSplitSampler
    from occ_gnn_tpu.sampling.native import NativeSplitSampler

    inner = NativeSplitSampler(g, g.train_nodes(), pmap, P, [3, 3], 64,
                               seed=5, num_workers=1,
                               emit_range=(lo, hi))
    mh = MultiHostSplitSampler(inner, mesh)
    assert mh.pre_sliced
    host_batch = inner.sample_batch(g.train_nodes()[:64])
    batch = mh._assemble(host_batch)
    xs_local = np.stack([
        np.asarray(gather_features(
            g.features, np.asarray(host_batch.input_nodes)[p]
        ))
        for p in range(hi - lo)  # rows already local
    ])
    xs = assemble_global(mesh, xs_local)
else:
    inner = SplitSampler(g, g.train_nodes(), pmap, P, [3, 3], 64, seed=5)
    # Replicated deterministic sampling: every process computes the same
    # slice, keeps its partitions' rows, assembles global arrays.
    host_batch = inner.sample_batch(g.train_nodes()[:64])
    local = jax.tree_util.tree_map(
        lambda x: np.asarray(x)[lo:hi], host_batch
    )
    batch = assemble_global(mesh, local)
    xs_local = np.stack([
        np.asarray(gather_features(
            g.features, np.asarray(host_batch.input_nodes)[p]
        ))
        for p in range(lo, hi)
    ])
    xs = assemble_global(mesh, xs_local)
model = SplitSAGE(g.feature_dim, 16, g.num_classes, 2)
params = model.init(jax.random.PRNGKey(0))
opt = optax.adam(1e-2)
ost = opt.init(params)
step = make_split_train_step(model, opt, mesh)
params, ost, loss, correct, cnt = step(params, ost, batch, xs)
lval = float(loss.addressable_shards[0].data)
cval = int(correct.addressable_shards[0].data)
tval = int(cnt.addressable_shards[0].data)
print(f"RESULT {proc_id} {lval:.6f} {cval} {tval}", flush=True)
