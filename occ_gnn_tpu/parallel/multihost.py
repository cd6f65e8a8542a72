"""Multi-host (pod-slice) support for split-parallel training.

Design (SURVEY.md §7 step 6): the device mesh spans all hosts' chips; the
SPMD step (shard_map + all_to_all) is host-agnostic — XLA routes
intra-host boundary exchange over ICI and cross-host over DCN. What needs
host-side care is the sampler: every host must agree on each minibatch's
sampled computation graph WITHOUT communicating.

The trick is **deterministic replicated sampling**: every host runs the
same seeded sampler over the same train-node permutation, producing the
same global slice; each host then keeps only the per-partition arrays for
the partitions its local chips own, and assembles the global [P, ...]
jax.Arrays with ``jax.make_array_from_process_local_data``. No cross-host
sampler traffic, exactly one all_to_all per layer at train time (the
reference never attempted multi-host; its scaling stopped at 4 GPUs on one
box).

The slicing EMISSION is sharded, not replicated: construct the inner
NativeSplitSampler with ``emit_range=(lo, hi)`` (this host's partition
rows from ``local_partition_range``) and the C++ service builds only
those rows of every padded array, while the seeded sampling and routing
passes run identically on every host so they stay bit-agreed without
communicating (validated in tests/test_multihost.py and
tests/test_multiprocess.py). MEASURED at products scale (r4,
benchmarks/results/multihost_scale.jsonl): per-host slice cost is
0.64x the single-host value on 2 hosts and bottoms at 0.49x for 8 —
the emission scales with the host's share, the replicated
routing/edge/shuffle bookkeeping is the floor. No slice exchange is
needed at all: each host feeds exactly its local shard to
``jax.make_array_from_process_local_data``.

Single-process usage degrades gracefully (process_count == 1), which is
how the multihost path is exercised in tests and by dryrun_multichip.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def local_partition_range(mesh: jax.sharding.Mesh) -> tuple[int, int]:
    """The contiguous [lo, hi) range of mesh-axis positions whose devices
    are addressable by this process (partition ids this host must supply).
    """
    devices = mesh.devices.reshape(-1)
    local_ids = [
        i for i, d in enumerate(devices)
        if d.process_index == jax.process_index()
    ]
    if not local_ids:
        return 0, 0
    lo, hi = min(local_ids), max(local_ids) + 1
    assert local_ids == list(range(lo, hi)), (
        "mesh axis must place each host's devices contiguously"
    )
    return lo, hi


def assemble_global(mesh: jax.sharding.Mesh, tree):
    """Build global [P, ...] jax.Arrays from each process's local slice of
    the leading axis. ``tree`` holds this host's rows (hi-lo on axis 0).

    In single-process runs this is just device_put with the mesh sharding.
    """
    sharding = NamedSharding(mesh, P("p"))

    def put(x):
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(put, tree)


class MultiHostFeatureCache:
    """SplitFeatureCache for multi-process runs: the global
    ``frames[P, frame_cap, H]`` array is assembled from per-host LOCAL rows
    (``jax.make_array_from_process_local_data``), so each host gathers
    static features and per-batch refresh tails only for the partitions its
    chips own — feature RAM traffic and H2D bytes scale ~1/num_hosts.

    Drop-in for SplitFeatureCache (same ``frames``/``refresh``/
    ``apply_tail`` surface, so NativeSplitSampler's delivery-time
    ``apply_tail`` hook works unchanged); single-process runs degrade to
    a device_put of the full frames.
    """

    def __init__(self, plan, mesh: jax.sharding.Mesh, dtype=None):
        import jax.numpy as jnp

        self.plan = plan
        self.mesh = mesh
        self.dtype = dtype or jnp.float32
        self.lo, self.hi = local_partition_range(mesh)
        self._sharding = NamedSharding(mesh, P("p"))
        local = plan.static_features(self.lo, self.hi).astype(
            np.dtype(self.dtype)
        )
        self.frames = self._assemble(local)
        self._update = None
        self._bucket_update = None

    def _assemble(self, local_rows: np.ndarray):
        if jax.process_count() == 1:
            return jax.device_put(local_rows, self._sharding)
        return jax.make_array_from_process_local_data(
            self._sharding, local_rows
        )

    def _update_fn(self):
        if self._update is None:
            ts = self.plan.tail_start
            rc = self.plan.refresh_cap

            @jax.jit
            def update(frames, tail):
                return frames.at[:, ts : ts + rc, :].set(tail)

            self._update = update
        return self._update

    def refresh(self, last_layer_nodes: np.ndarray) -> None:
        """Numpy-sampler path: plan.refresh keeps global bookkeeping (all
        hosts run it identically), but only local rows cross to devices."""
        tail = self.plan.refresh(last_layer_nodes)
        if tail is None:
            return
        local = np.asarray(tail[self.lo : self.hi]).astype(
            np.dtype(self.dtype)
        )
        self.frames = self._update_fn()(self.frames, self._assemble(local))

    def apply_tail_gathered(self, tail_buf: np.ndarray,
                            counts: np.ndarray) -> None:
        """Worker-gathered tails (NativeSplitSampler(gather_tail=True) with
        emit_range=(lo, hi)): ``tail_buf`` holds ONLY this host's local
        partition rows, already cast to the storage dtype, at the true
        feature width. ``counts`` covers ALL P partitions (the refresh
        list is global bookkeeping), so every host derives the same
        shapes without communicating. Rows past each partition's count
        are unspecified and never referenced by the batch."""
        plan = self.plan
        if not plan.needs_refresh:
            return
        rc = plan.refresh_cap
        q = max(-(-rc // 16), 8)
        k = int(max(counts)) if len(counts) else 0
        bucket = min(max(-(-k // q) * q, q), rc)
        if self._bucket_update is None:
            import jax.numpy as jnp

            ts = plan.tail_start

            @jax.jit
            def update(frames, tail):
                t = tail.astype(frames.dtype)
                pad = frames.shape[-1] - t.shape[-1]
                if pad:
                    t = jnp.pad(t, ((0, 0), (0, 0), (0, pad)))
                return jax.lax.dynamic_update_slice(frames, t, (0, ts, 0))

            self._bucket_update = update
        local = np.ascontiguousarray(tail_buf[:, :bucket])
        tail_sh = NamedSharding(self.mesh, P("p"))
        if jax.process_count() == 1:
            t = jax.device_put(local, tail_sh)
        else:
            t = jax.make_array_from_process_local_data(tail_sh, local)
        self.frames = self._bucket_update(self.frames, t)

    def apply_tail(self, refresh_nodes: np.ndarray) -> None:
        """Native-service path: ``refresh_nodes`` is the ALL-P refresh list
        (global bookkeeping); features are gathered for LOCAL rows only."""
        plan = self.plan
        if not plan.needs_refresh:
            return
        H = plan.graph.feature_dim
        tail = np.zeros((self.hi - self.lo, plan.refresh_cap, H),
                        dtype=np.dtype(self.dtype))
        for i, p in enumerate(range(self.lo, self.hi)):
            rows = refresh_nodes[p]
            k = int((rows >= 0).sum())
            if k:
                tail[i, :k] = plan.graph.features[rows[:k]]
        self.frames = self._update_fn()(self.frames, self._assemble(tail))


class MultiHostSplitSampler:
    """Wraps a SplitSampler/NativeSplitSampler for multi-host runs.

    Every host constructs the SAME underlying sampler (same seed, same
    train nodes, P = total mesh size). At pop time the host slices rows
    [lo, hi) of every [P, ...] array and assembles global arrays over the
    mesh. For process_count == 1 this reduces to sharding the full batch.
    """

    def __init__(self, inner, mesh: jax.sharding.Mesh):
        self.inner = inner
        self.mesh = mesh
        self.lo, self.hi = local_partition_range(mesh)
        # When the inner sampler already emits ONLY this host's partition
        # rows (NativeSplitSampler(emit_range=(lo, hi)) — per-host slicing
        # emission sharded per host), skip the slice and assemble directly.
        self.pre_sliced = (
            getattr(inner, "emit_lo", 0) == self.lo
            and getattr(inner, "emit_hi", None) == self.hi
        )

    def __len__(self):
        return len(self.inner)

    def __iter__(self):
        for batch in self.inner:
            yield self._assemble(batch)

    def sample_batch(self, nodes):
        return self._assemble(self.inner.sample_batch(nodes))

    def close(self):
        if hasattr(self.inner, "close"):
            self.inner.close()

    def stats(self):
        return self.inner.stats()

    def _assemble(self, batch):
        lo, hi = self.lo, self.hi

        def slice_local(x):
            x = np.asarray(x)
            return x if self.pre_sliced else x[lo:hi]

        local = jax.tree_util.tree_map(slice_local, batch)
        out = assemble_global(self.mesh, local)
        # Host-local input rows for no-cache feature gathering: global
        # sharded arrays are not host-readable in multi-process runs.
        # (None when a cache supplies the frame and the sampler skipped
        # emitting input ids.)
        out._local_input_nodes = (
            np.asarray(local.input_nodes)
            if local.input_nodes is not None else None
        )
        return out
