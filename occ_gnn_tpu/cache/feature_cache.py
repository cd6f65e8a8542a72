"""Per-partition HBM feature caches.

TPU re-design of the reference MemoryManager
(/root/reference/python/utils/memory_manager.py):

  * Each partition's device frame is a single static-shaped array
    ``[static_cap + refresh_cap, H]``: a *static* region filled once at
    init (degree-sorted top-k of the partition when cache_pct <= 1/P;
    whole partition + highest-degree foreign nodes when > 1/P — semantics
    of memory_manager.py:51-66), and a *dynamic tail* rebuilt each batch
    by ``refresh`` (memory_manager.py:75-106: evict previous fill, copy
    features of the batch's missing owned nodes).
  * Host-side maps are COMPACT (papers100M-viable), unlike the reference's
    dense ``node_gpu_mask[N, 4]`` / ``global_to_local[N, 4]``
    (memory_manager.py:17-106 — ~16 GB at N=111M): one ``owner_local[N]``
    int32 (frame row on the node's OWNER partition, -1 if uncached; a node
    is statically cached only on its owner except for the high-degree
    foreign extras) plus per-partition sorted ``foreign_nodes``/
    ``foreign_local`` arrays for those extras (empty when cache <= 1/P).
    The slicer queries them through ``cached_on``/``local_rows`` to route
    cache-aware "natural" edges and emit frame-local src indices.
  * Device updates are static-shaped: one ``frames.at[:, S:, :].set(tail)``
    per batch, so the training step never recompiles.
"""

from __future__ import annotations

import numpy as np

from occ_gnn_tpu.data.graph import Graph


class CachePlan:
    """Host-side cache policy + index maps for P partitions."""

    def __init__(
        self,
        graph: Graph,
        partition_map: np.ndarray,
        num_partitions: int,
        cache_percentage: float,
        refresh_cap: int,
    ):
        assert 0.0 < cache_percentage <= 1.0
        self.graph = graph
        self.P = num_partitions
        self.wmap = np.asarray(partition_map, dtype=np.int32)
        self.cache_percentage = cache_percentage
        self.refresh_cap = refresh_cap
        n = graph.num_nodes
        self.static_size = int(cache_percentage * n)
        self.static_nodes: list[np.ndarray] = []
        # Full replication (cache_pct == 1.0, the HBM-auto-sized regime at
        # products scale) uses IDENTITY frames: every partition caches the
        # whole table at frame row == global id. Consequences the slicers
        # exploit: every edge is natural (zero innermost-layer shuffle at
        # any P), row lookups are O(1) identity instead of per-partition
        # foreign-map binary searches, and the device can synthesize the
        # innermost layer itself from a resident CSR (parallel/split.
        # synthesize_device_innermost) because frame row == node id.
        self.replicated = cache_percentage >= 1.0
        if self.replicated:
            self.needs_refresh = False
            self.refresh_cap = 0
            ident = np.arange(n, dtype=np.int64)
            self.static_nodes = [ident] * num_partitions
            self.owner_local = np.arange(n, dtype=np.int32)
            self.foreign_nodes = [np.empty(0, np.int64)] * num_partitions
            self.foreign_local = [np.empty(0, np.int32)] * num_partitions
            self.static_sizes = np.full(num_partitions, n, dtype=np.int64)
            self.tail_start = n
            # +1: reserved dense-aggregation zero row (see below).
            self.frame_cap = n + 1
            self._dynamic = [np.empty(0, np.int64)
                             for _ in range(num_partitions)]
            self.static_owner_local = self.owner_local
            self.foreign_offsets = np.zeros(num_partitions + 1, np.int64)
            self.foreign_nodes_flat = np.empty(0, np.int64)
            self.foreign_local_flat = np.empty(0, np.int32)
            return
        self.needs_refresh = cache_percentage < (1.0 / num_partitions)
        if not self.needs_refresh:
            # cache >= 1/P: every owned node is statically cached, no
            # per-batch refresh — don't waste frame rows or transfer bytes.
            refresh_cap = 0
            self.refresh_cap = 0
        # Compact maps: frame row on the node's OWNER (static region first,
        # dynamic tail rows added by refresh), plus per-partition sorted
        # (global id -> frame row) arrays for foreign high-degree extras.
        self.owner_local = np.full(n, -1, dtype=np.int32)
        self.foreign_nodes: list[np.ndarray] = []
        self.foreign_local: list[np.ndarray] = []
        self.frame_cap = self.static_size + refresh_cap
        out_deg = graph.out_degrees()
        for p in range(num_partitions):
            own = np.nonzero(self.wmap == p)[0]
            if self.needs_refresh:
                order = np.argsort(-out_deg[own], kind="stable")
                cached = own[order[: self.static_size]]
                self.owner_local[cached] = np.arange(
                    cached.shape[0], dtype=np.int32
                )
                fsorted = np.empty(0, dtype=np.int64)
                flocal = np.empty(0, dtype=np.int32)
            else:
                foreign = np.nonzero(self.wmap != p)[0]
                order = np.argsort(-out_deg[foreign], kind="stable")
                extra = max(self.static_size - own.shape[0], 0)
                fsel = foreign[order[:extra]]
                cached = np.concatenate([own, fsel])
                self.owner_local[own] = np.arange(
                    own.shape[0], dtype=np.int32
                )
                frows = own.shape[0] + np.arange(
                    fsel.shape[0], dtype=np.int64
                )
                s = np.argsort(fsel, kind="stable")
                fsorted = fsel[s]
                flocal = frows[s].astype(np.int32)
                # static region is sized for the worst partition
                self.frame_cap = max(
                    self.frame_cap, cached.shape[0] + refresh_cap
                )
            self.static_nodes.append(cached)
            self.foreign_nodes.append(fsorted)
            self.foreign_local.append(flocal)
        self.static_sizes = np.array(
            [c.shape[0] for c in self.static_nodes], dtype=np.int64
        )
        self.tail_start = int(self.static_sizes.max())
        # +1: the LAST frame row is reserved as the dense-aggregation zero
        # row (nbr_idx padding target) — never assigned to any node, zeroed
        # at init, untouched by refresh.
        self.frame_cap = self.tail_start + refresh_cap + 1
        self._dynamic: list[np.ndarray] = [
            np.empty(0, dtype=np.int64) for _ in range(num_partitions)
        ]
        # Static-only snapshot + flat foreign arrays for the C++ service:
        # workers read these immutable maps and assign dynamic-tail ids per
        # sample, so no shared cache state is ever mutated concurrently.
        self.static_owner_local = self.owner_local.copy()
        sizes = [f.shape[0] for f in self.foreign_nodes]
        self.foreign_offsets = np.zeros(num_partitions + 1, dtype=np.int64)
        np.cumsum(sizes, out=self.foreign_offsets[1:])
        self.foreign_nodes_flat = (
            np.concatenate(self.foreign_nodes)
            if self.foreign_offsets[-1] else np.empty(0, np.int64)
        )
        self.foreign_local_flat = (
            np.concatenate(self.foreign_local)
            if self.foreign_offsets[-1] else np.empty(0, np.int32)
        )

    # -- compact-map queries (elementwise over (node, partition) pairs) ----

    def _foreign_rows(self, nodes: np.ndarray, p: int) -> np.ndarray:
        """Frame rows of ``nodes`` among partition p's foreign extras
        (-1 where absent)."""
        fn = self.foreign_nodes[p]
        out = np.full(nodes.shape, -1, dtype=np.int64)
        if fn.size:
            idx = np.minimum(np.searchsorted(fn, nodes), fn.size - 1)
            hit = fn[idx] == nodes
            out[hit] = self.foreign_local[p][idx[hit]]
        return out

    def cached_on(self, nodes: np.ndarray, parts) -> np.ndarray:
        """Elementwise: is node cached on partition (static region or the
        current dynamic tail)? Replaces the dense node_mask[N, P]."""
        nodes = np.asarray(nodes, dtype=np.int64)
        if self.replicated:
            return np.ones(nodes.shape, dtype=bool)
        parts = np.broadcast_to(np.asarray(parts), nodes.shape)
        res = (self.wmap[nodes] == parts) & (self.owner_local[nodes] >= 0)
        for p in range(self.P):
            if self.foreign_nodes[p].size:
                m = parts == p
                if m.any():
                    res[m] |= self._foreign_rows(nodes[m], p) >= 0
        return res

    def local_rows(self, nodes: np.ndarray, parts) -> np.ndarray:
        """Elementwise frame row of node on partition (-1 if uncached).
        Replaces the dense global_to_local[N, P]."""
        nodes = np.asarray(nodes, dtype=np.int64)
        if self.replicated:
            return nodes.copy()
        parts = np.broadcast_to(np.asarray(parts), nodes.shape)
        out = np.where(
            self.wmap[nodes] == parts,
            self.owner_local[nodes].astype(np.int64),
            -1,
        )
        for p in range(self.P):
            if self.foreign_nodes[p].size:
                m = (parts == p) & (out < 0)
                if m.any():
                    fr = self._foreign_rows(nodes[m], p)
                    out[m] = np.where(fr >= 0, fr, out[m])
        return out

    def dynamic_fill_sizes(self) -> list[int]:
        """Per-partition count of dynamic-tail nodes staged by the most
        recent ``refresh`` (0s before the first refresh). Public accessor
        for capacity measurement — callers must not touch ``_dynamic``."""
        return [int(d.shape[0]) for d in self._dynamic]

    def static_features(self, lo: int = 0, hi: int | None = None) -> np.ndarray:
        """[hi-lo, frame_cap, H] initial frames (tail zeroed) for
        partitions [lo, hi) — multi-host callers build only their local
        rows; the default is all P."""
        hi = self.P if hi is None else hi
        H = self.graph.feature_dim
        out = np.zeros((hi - lo, self.frame_cap, H), dtype=np.float32)
        for i, p in enumerate(range(lo, hi)):
            rows = self.static_nodes[p]
            out[i, : rows.shape[0]] = self.graph.features[rows]
        return out

    def refresh(self, last_layer_nodes: np.ndarray,
                collect: bool = True) -> np.ndarray | None:
        """Evict the previous batch's dynamic fill and stage features of the
        batch's missing owned nodes. Returns the new tail [P, R_cap, H] to
        write at frames[:, tail_start:, :], or None when no refresh needed
        (cache >= 1/P — reference memory_manager.py:76-78).

        ``collect=False`` updates only the bookkeeping (owner_local /
        _dynamic) without materializing the tail array — used by the fast
        capacity prober, where allocating a worst-case [P, R_cap, H]
        zeros per batch dominated measurement time."""
        if not self.needs_refresh:
            return None
        for p in range(self.P):
            prev = self._dynamic[p]
            if prev.size:
                self.owner_local[prev] = -1
            self._dynamic[p] = np.empty(0, dtype=np.int64)
        nodes = np.asarray(last_layer_nodes, dtype=np.int64)
        H = self.graph.feature_dim
        tail = (np.zeros((self.P, self.refresh_cap, H), dtype=np.float32)
                if collect else None)
        for p in range(self.P):
            own = nodes[self.wmap[nodes] == p]
            missing = own[self.owner_local[own] == -1]
            if missing.shape[0] > self.refresh_cap:
                raise ValueError(
                    f"refresh overflow: partition {p} misses "
                    f"{missing.shape[0]} nodes, refresh_cap "
                    f"{self.refresh_cap}"
                )
            k = missing.shape[0]
            if k:
                if collect:
                    tail[p, :k] = self.graph.features[missing]
                self.owner_local[missing] = self.tail_start + np.arange(
                    k, dtype=np.int32
                )
                self._dynamic[p] = missing
        return tail


class SplitFeatureCache:
    """Device-side frames for the split-parallel path.

    ``dtype=jnp.bfloat16`` halves cache HBM and refresh traffic; the
    models upcast per-gather (see parallel/split.local_aggregate)."""

    def __init__(self, plan: CachePlan, sharding=None, dtype=None):
        import jax.numpy as jnp

        self.plan = plan
        self.dtype = dtype or jnp.float32
        # Cast on the HOST so the one-time init upload carries the storage
        # dtype (bf16 halves it — with an auto-sized full cache this is
        # the whole feature table, the largest single transfer).
        frames = jnp.asarray(
            plan.static_features().astype(np.dtype(self.dtype))
        )
        if sharding is not None:
            import jax

            frames = jax.device_put(frames, sharding)
        self.frames = frames
        self._sharding = sharding
        self._update = None
        # Per-batch tail-transfer accounting (bench reads these).
        self.tail_batches = 0
        self.tail_bytes_total = 0
        self.tail_rows_last = 0

    def refresh(self, last_layer_nodes: np.ndarray) -> None:
        """Numpy-sampler path. Shares apply_tail's transfer trimming:
        only the filled rows (bucketed) at the true feature width cross
        host->device; rows past the bucket keep stale values, which are
        never referenced (tail ids only point below the fill)."""
        import jax
        import jax.numpy as jnp

        tail = self.plan.refresh(last_layer_nodes)
        if tail is None:
            return
        plan = self.plan
        g = plan.graph
        Ht = g.true_feature_dim or g.feature_dim
        rc = plan.refresh_cap
        counts = plan.dynamic_fill_sizes()
        q = max(-(-rc // 16), 8)
        bucket = min(max(-(-max(counts) // q) * q, q), rc)
        if self._update is None:
            ts = plan.tail_start

            @jax.jit
            def update(frames, tail):
                t = tail.astype(frames.dtype)
                pad = frames.shape[-1] - t.shape[-1]
                if pad:
                    t = jnp.pad(t, ((0, 0), (0, 0), (0, pad)))
                return jax.lax.dynamic_update_slice(frames, t, (0, ts, 0))

            self._update = update
        # Cast on the HOST so the H2D transfer carries the storage dtype
        # (bf16 halves the refresh bytes — at products scale the tail is
        # the dominant per-batch transfer).
        t = jnp.asarray(np.ascontiguousarray(
            tail[:, :bucket, :Ht]
        ).astype(np.dtype(self.dtype)))
        if self._sharding is not None:
            t = jax.device_put(t, self._sharding)
        self.frames = self._update(self.frames, t)
        self.tail_batches += 1
        self.tail_rows_last = bucket
        self.tail_bytes_total += int(t.nbytes)

    def apply_tail(self, refresh_nodes: np.ndarray) -> None:
        """Write the dynamic tail for a sample produced by the C++ service:
        ``refresh_nodes[p, c]`` (global id, -1 pad) gets frame row
        ``tail_start + c``. Functional update — in-flight steps keep their
        own frames version, so the pipelined workers can run ahead.

        Transfer trimming (VERDICT r3 item 1 — the tail IS the dominant
        per-batch host->device payload):
          * only the FILLED rows ship, rounded up to a 16-step bucket
            ladder (each bucket size traces the tiny update fn once);
            rows beyond the bucket keep stale values, which is safe —
            this batch's tail ids all point below the fill count;
          * rows ship at the graph's TRUE feature width and are zero-
            padded device-side (pad_feature_dim columns are identically
            zero, so transferring them was pure waste — 28/128 of the
            bytes at the bench's 100->128 padding)."""
        import jax
        import jax.numpy as jnp

        plan = self.plan
        if not plan.needs_refresh:
            return
        g = plan.graph
        Ht = g.true_feature_dim or g.feature_dim
        P = plan.P
        rc = plan.refresh_cap
        counts = [int((refresh_nodes[p] >= 0).sum()) for p in range(P)]
        q = max(-(-rc // 16), 8)
        bucket = min(max(-(-max(counts) // q) * q, q), rc)
        # Build in the storage dtype: the gather casts on assignment and
        # the H2D transfer carries half the bytes under bf16.
        tail = np.zeros((P, bucket, Ht), dtype=np.dtype(self.dtype))
        for p in range(P):
            k = counts[p]
            if k:
                tail[p, :k] = g.features[refresh_nodes[p][:k], :Ht]
        if self._update is None:
            ts = plan.tail_start

            @jax.jit
            def update(frames, tail):
                t = tail.astype(frames.dtype)
                pad = frames.shape[-1] - t.shape[-1]
                if pad:
                    t = jnp.pad(t, ((0, 0), (0, 0), (0, pad)))
                return jax.lax.dynamic_update_slice(frames, t, (0, ts, 0))

            self._update = update
        t = jnp.asarray(tail)
        if self._sharding is not None:
            t = jax.device_put(t, self._sharding)
        self.frames = self._update(self.frames, t)
        self.tail_batches += 1
        self.tail_rows_last = bucket
        self.tail_bytes_total += int(tail.nbytes)

    def apply_tail_gathered(self, tail_buf: np.ndarray,
                            counts: np.ndarray) -> None:
        """Apply a tail whose feature rows were already gathered+cast by
        the C++ workers (NativeSplitSampler(gather_tail=True)):
        ``tail_buf[p, c]`` holds the features of refresh row c of
        partition p for c < counts[p]; rows past the count are
        unspecified and never referenced by the batch (their frame rows
        get no tail id). The consumer only buckets and uploads — the
        ~190 ms/batch serial gather this replaces was the host-side
        production floor at products scale."""
        import jax
        import jax.numpy as jnp

        plan = self.plan
        if not plan.needs_refresh:
            return
        rc = plan.refresh_cap
        q = max(-(-rc // 16), 8)
        k = int(max(counts)) if len(counts) else 0
        bucket = min(max(-(-k // q) * q, q), rc)
        if self._update is None:
            ts = plan.tail_start

            @jax.jit
            def update(frames, tail):
                t = tail.astype(frames.dtype)
                pad = frames.shape[-1] - t.shape[-1]
                if pad:
                    t = jnp.pad(t, ((0, 0), (0, 0), (0, pad)))
                return jax.lax.dynamic_update_slice(frames, t, (0, ts, 0))

            self._update = update
        t = jnp.asarray(tail_buf[:, :bucket])
        if self._sharding is not None:
            t = jax.device_put(t, self._sharding)
        self.frames = self._update(self.frames, t)
        self.tail_batches += 1
        self.tail_rows_last = bucket
        self.tail_bytes_total += int(t.nbytes)


class SingleChipCache:
    """PaGraph-style static cache for the single-chip/DP path
    (/root/reference/python/pa_cache_multi_gpu.py:43-90): global
    degree-sorted top-k on device; per batch the input frame is assembled
    from cache hits (device gather) + misses (host copy). Tracks hit rate."""

    def __init__(self, graph: Graph, cache_percentage: float,
                 input_frame_cap: int):
        import jax.numpy as jnp

        self.graph = graph
        n = graph.num_nodes
        self.num_cached = int(cache_percentage * n)
        order = np.argsort(-graph.out_degrees(), kind="stable")
        self.cached_nodes = order[: self.num_cached]
        self.global_to_local = np.full(n, -1, dtype=np.int64)
        self.global_to_local[self.cached_nodes] = np.arange(self.num_cached)
        self.frame = jnp.asarray(graph.features[self.cached_nodes])
        self.input_frame_cap = input_frame_cap
        self.hits = 0
        self.misses = 0
        self._assemble = None

    @property
    def hit_rate(self) -> float:
        t = self.hits + self.misses
        return self.hits / t if t else 0.0

    def load_input_frame(self, input_nodes: np.ndarray):
        """x0[F_cap, H] for the sampled batch's input frame: cached rows
        gathered on device, missing rows host->device (the load_subtensor
        hit/miss split, pa_cache_multi_gpu.py:62-90)."""
        import jax
        import jax.numpy as jnp

        idx = np.asarray(input_nodes)
        valid = idx >= 0
        safe = np.where(valid, idx, 0)
        local = self.global_to_local[safe]
        hit = (local >= 0) & valid
        miss = (~hit) & valid
        self.hits += int(hit.sum())
        self.misses += int(miss.sum())
        miss_feats = np.zeros(
            (self.input_frame_cap, self.graph.feature_dim), np.float32
        )
        miss_rows = np.nonzero(miss)[0]
        miss_feats[miss_rows] = self.graph.features[idx[miss_rows]]
        if self._assemble is None:

            @jax.jit
            def assemble(frame, local, hit, miss_feats):
                gathered = frame[jnp.maximum(local, 0)]
                return jnp.where(hit[:, None], gathered, miss_feats)

            self._assemble = assemble
        return self._assemble(
            self.frame,
            jnp.asarray(local),
            jnp.asarray(hit),
            jnp.asarray(miss_feats),
        )
