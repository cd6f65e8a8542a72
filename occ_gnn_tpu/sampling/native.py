"""ctypes bindings for the C++ sampling/slicing service (csrc/).

``NativeSplitSampler`` is a drop-in replacement for the numpy
``SplitSampler``: same constructor surface, same SplitBatch output, but
sampling+slicing runs in C++ worker threads that pipeline ahead of the
training loop (the role of the reference's CSlicer/WorkerPool service,
/root/reference/cslicer/pyfrontend.cpp:25-89 + WorkerPool.cpp:4-60).

The shared library is built on demand from csrc/Makefile.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from occ_gnn_tpu.data.graph import Graph
from occ_gnn_tpu.parallel.split import SplitBatch, SplitLayer
from occ_gnn_tpu.sampling.slicer import plan_split_capacities

_CSRC = os.path.join(os.path.dirname(__file__), "..", "csrc")
_LIB_PATH = os.path.join(_CSRC, "libocc_sampler.so")
_lib = None


def _build_library():
    src = os.path.join(_CSRC, "occ_sampler.cpp")
    if (not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
        subprocess.run(["make", "-s", "libocc_sampler.so"], cwd=_CSRC,
                       check=True)


def load_library():
    global _lib
    if _lib is not None:
        return _lib
    _build_library()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.occ_create.restype = ctypes.c_void_p
    lib.occ_create.argtypes = [
        ctypes.c_int64,  # num_nodes
        ctypes.c_void_p,  # indptr
        ctypes.c_void_p,  # indices
        ctypes.c_void_p,  # wmap
        ctypes.c_int32,  # P
        ctypes.c_int32,  # L
        ctypes.c_void_p,  # fanouts
        ctypes.c_void_p,  # frame_caps
        ctypes.c_void_p,  # edge_caps
        ctypes.c_void_p,  # dst_caps
        ctypes.c_void_p,  # out_caps
        ctypes.c_void_p,  # shuffle_caps
        ctypes.c_void_p,  # deg_caps
        ctypes.c_void_p,  # owner_local (int32[N], static snapshot)
        ctypes.c_void_p,  # foreign_off (int64[P+1])
        ctypes.c_void_p,  # foreign_nodes (int64, flat sorted)
        ctypes.c_void_p,  # foreign_local (int32, flat)
        ctypes.c_int64,  # tail_start
        ctypes.c_int64,  # refresh_cap
        ctypes.c_int32,  # num_workers
        ctypes.c_int32,  # queue_depth
        ctypes.c_uint64,  # seed
        ctypes.c_int32,  # sample_replace
        ctypes.c_int32,  # emit_lo
        ctypes.c_int32,  # emit_hi
        ctypes.c_int32,  # emit_coo
        ctypes.c_int32,  # emit_input
        ctypes.c_void_p,  # features (f32 table; NULL = no tail gather)
        ctypes.c_int64,  # feat_stride (elements)
        ctypes.c_int32,  # feat_cols (true feature dim)
        ctypes.c_int32,  # feat_bf16
        ctypes.c_int32,  # replicated (identity cache frames)
        ctypes.c_int32,  # device_innermost (emit dst_global only for l0)
    ]
    lib.occ_submit.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                               ctypes.c_int64, ctypes.c_int64]
    lib.occ_next.restype = ctypes.c_int32
    lib.occ_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                             ctypes.c_void_p]
    lib.occ_stats.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.occ_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class _SlicerError:
    """Error outcome of one sample, carried through the reorder buffer so
    delivery order survives a caught overflow: batches after the failed
    seq still arrive in submission order (VERDICT r2 item 8 — raising
    inside _pop_any out of turn left _reorder/_next_deliver_seq
    inconsistent for direct sample_batch users)."""

    def __init__(self, code: int):
        self.code = code

    def raise_(self):
        raise ValueError(
            f"native slicer error: {_ERRORS.get(self.code, self.code)} — "
            f"raise the capacity config"
        )


_ERRORS = {
    1: "owned capacity overflow",
    2: "edge capacity overflow",
    3: "dst frame capacity overflow",
    4: "shuffle capacity overflow",
    5: "routed src missing from cache",
    6: "refresh capacity overflow",
    7: "input frame capacity overflow",
    8: "src frame capacity overflow (one row reserved as the dense zero row)",
    9: "degree capacity overflow",
}


class NativeSplitSampler:
    """Pipelined C++ sampler+slicer with the SplitSampler interface."""

    def __init__(
        self,
        graph: Graph,
        train_nodes: np.ndarray,
        partition_map: np.ndarray,
        num_partitions: int,
        fanouts: list[int],
        batch_size: int,
        capacities: dict | None = None,
        seed: int = 0,
        drop_last: bool = False,
        cache=None,
        num_workers: int = 2,
        queue_depth: int = 4,
        replace: bool = True,
        packed: bool = True,
        emit_range: tuple[int, int] | None = None,
        emit_coo: bool | None = None,
        emit_input: bool | None = None,
        gather_tail: bool | None = None,
        innermost: str = "host",
    ):
        self.graph = graph
        self.train_nodes = np.asarray(train_nodes, dtype=np.int64)
        self.P = num_partitions
        self.fanouts = list(fanouts)
        self.batch_size = batch_size
        self.caps = capacities or plan_split_capacities(
            batch_size, self.fanouts, graph.num_nodes, num_partitions,
            num_edges=graph.num_edges,
        )
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        # Multi-host work sharding: emit only partitions [lo, hi) — this
        # host's share of the slicing work (the sample itself stays seeded
        # and replicated so hosts agree without communicating; see
        # parallel/multihost.py). None = emit all P rows.
        self.emit_lo, self.emit_hi = (
            emit_range if emit_range is not None else (0, num_partitions)
        )
        if not (0 <= self.emit_lo < self.emit_hi <= num_partitions):
            raise ValueError(f"bad emit_range {emit_range}")
        self.P_emit = self.emit_hi - self.emit_lo
        self.cache = cache
        plan = getattr(cache, "plan", cache)
        self.cache_plan = plan
        self.replicated = bool(plan is not None
                               and getattr(plan, "replicated", False))
        # Device-innermost sampling (SplitLayer.dst_global contract): the
        # deepest fanout expansion — the dominant host cost and ~84% of
        # the measured per-batch arena at products scale — moves into the
        # jitted step (parallel/split.synthesize_device_innermost). Needs
        # identity frames (replicated cache), with-replacement semantics,
        # and a bounded innermost fanout.
        if innermost not in ("host", "device"):
            raise ValueError(f"innermost must be host|device, got {innermost}")
        self.device_innermost = innermost == "device"
        if self.device_innermost:
            if not self.replicated:
                raise ValueError(
                    "innermost='device' needs a fully replicated cache "
                    "(cache_percentage == 1.0 — use --cache-per auto; "
                    "frame row == global id is what lets the device "
                    "gather straight from the frame)"
                )
            if not replace:
                raise ValueError(
                    "innermost='device' implements the reference's "
                    "with-replacement draws; use replace=True"
                )
            if self.fanouts[-1] <= 0:
                raise ValueError(
                    "innermost='device' needs a bounded innermost fanout"
                )
            # All dst rows are owned under replication (every edge is
            # natural, no foreign dst rows), so the owned cap — which also
            # chains to layer 1's input frame (out_caps[l] ==
            # frame_caps[l+1]) — is the binding bound; shrinking dst to it
            # shrinks dst_global and the on-device synthesis.
            self.caps = dict(self.caps)
            self.caps["dst_caps"] = list(self.caps["dst_caps"])
            self.caps["dst_caps"][0] = self.caps["out_caps"][0]

        lib = load_library()
        # Keep every array passed by pointer alive on self.
        self._indptr = np.ascontiguousarray(graph.indptr, dtype=np.int64)
        self._indices = np.ascontiguousarray(graph.indices, dtype=np.int64)
        self._wmap = np.ascontiguousarray(partition_map, dtype=np.int32)
        self._fanouts = np.asarray(self.fanouts, dtype=np.int32)
        self._frame_caps = np.asarray(self.caps["frame_caps"], dtype=np.int64)
        self._edge_caps = np.asarray(self.caps["edge_caps"], dtype=np.int64)
        self._dst_caps = np.asarray(self.caps["dst_caps"], dtype=np.int64)
        self._out_caps = np.asarray(self.caps["out_caps"], dtype=np.int64)
        self._shuffle_caps = np.asarray(
            self.caps["shuffle_caps"], dtype=np.int64
        )
        from occ_gnn_tpu.sampling.slicer import default_deg_caps

        # Derived, not tunable: always fanout + 1 (see slicer.default_deg_caps).
        self._deg_caps = np.asarray(
            default_deg_caps(self.fanouts), dtype=np.int64
        )
        self.caps["deg_caps"] = [int(x) for x in self._deg_caps]
        # Payload trimming (VERDICT r3 item 1): by default the COO is
        # emitted only for layers without the dense nbr matrix (the device
        # consumes nbr when present — see parallel/split.aggregate), and
        # input_nodes only when no cache supplies the input frame.
        # emit_coo=True forces the full emission (parity tests / debug).
        self.emit_coo = bool(emit_coo) if emit_coo is not None else False
        self._coo_l = [
            self.emit_coo or int(self._deg_caps[l]) <= 0
            for l in range(len(self.fanouts))
        ]
        self.emit_input = (
            bool(emit_input) if emit_input is not None else plan is None
        )
        # Worker-side tail feature gather (r4): when the cache consumes
        # pre-gathered tails (SplitFeatureCache/MultiHostFeatureCache),
        # the C++ workers gather+cast the refresh rows' features into a
        # per-sample buffer — the ~190 ms/batch serial host gather at
        # products scale moves into the pipelined worker pool.
        auto_gather = (
            plan is not None
            and getattr(plan, "needs_refresh", False)
            and cache is not None
            and hasattr(cache, "apply_tail_gathered")
            and isinstance(graph.features, np.ndarray)
            and graph.features.dtype == np.float32
        )
        self.gather_tail = (bool(gather_tail) if gather_tail is not None
                            else auto_gather)
        self._feat_bf16 = 0
        feats_p = None
        feat_stride = feat_cols = 0
        if self.gather_tail:
            assert plan is not None, "gather_tail needs a cache plan"
            f = graph.features
            assert f.strides[1] == 4, "features must be row-contiguous f32"
            tail_dtype = np.dtype(getattr(cache, "dtype", np.float32))
            self._feat_bf16 = 1 if tail_dtype.itemsize == 2 else 0
            feat_cols = int(graph.true_feature_dim or graph.feature_dim)
            feat_stride = f.strides[0] // 4
            feats_p = f.ctypes.data
            # Pooled per-sample buffers: out-of-order completions are
            # parked in the reorder dict with their own tail buffer, so a
            # later pop never overwrites an undelivered batch's tail.
            self._tail_shape = (
                self.P_emit, max(plan.refresh_cap, 1), feat_cols
            )
            self._tail_dtype = tail_dtype
            self._tail_pool: list[np.ndarray] = []
        if plan is not None:
            # Static-only compact maps: dynamic tail ids are assigned per
            # sample inside the workers (no shared mutable state).
            self._owner_local = np.ascontiguousarray(
                plan.static_owner_local, dtype=np.int32
            )
            self._foreign_off = np.ascontiguousarray(
                plan.foreign_offsets, dtype=np.int64
            )
            self._foreign_nodes = np.ascontiguousarray(
                plan.foreign_nodes_flat, dtype=np.int64
            )
            self._foreign_local = np.ascontiguousarray(
                plan.foreign_local_flat, dtype=np.int32
            )
            owner_p = self._owner_local.ctypes.data
            foff_p = self._foreign_off.ctypes.data
            fnod_p = (self._foreign_nodes.ctypes.data
                      if self._foreign_nodes.size else None)
            floc_p = (self._foreign_local.ctypes.data
                      if self._foreign_local.size else None)
            tail_start = plan.tail_start
            # plan.refresh_cap is 0 when cache >= 1/P (no per-batch
            # refresh), so no refresh bytes cross host->device each batch.
            refresh_cap = plan.refresh_cap
        else:
            self._owner_local = self._foreign_off = None
            self._foreign_nodes = self._foreign_local = None
            owner_p = foff_p = fnod_p = floc_p = None
            tail_start = refresh_cap = 0
        self.refresh_cap = refresh_cap

        self._handle = lib.occ_create(
            graph.num_nodes,
            self._indptr.ctypes.data,
            self._indices.ctypes.data,
            self._wmap.ctypes.data,
            self.P,
            len(self.fanouts),
            self._fanouts.ctypes.data,
            self._frame_caps.ctypes.data,
            self._edge_caps.ctypes.data,
            self._dst_caps.ctypes.data,
            self._out_caps.ctypes.data,
            self._shuffle_caps.ctypes.data,
            self._deg_caps.ctypes.data,
            owner_p,
            foff_p,
            fnod_p,
            floc_p,
            tail_start,
            refresh_cap,
            num_workers,
            queue_depth,
            seed + 1,
            1 if replace else 0,
            self.emit_lo,
            self.emit_hi,
            1 if self.emit_coo else 0,
            1 if self.emit_input else 0,
            feats_p,
            feat_stride,
            feat_cols,
            self._feat_bf16,
            1 if self.replicated else 0,
            1 if self.device_innermost else 0,
        )
        self._lib = lib
        self._closed = False
        self._next_submit_seq = 0
        self._next_deliver_seq = 0
        self._reorder: dict[int, SplitBatch] = {}
        self.packed = packed
        self._layout = None
        self._unpack_fn = None
        self._labels_dev = None

    # -- epoch iteration ---------------------------------------------------

    def __len__(self):
        n = self.train_nodes.shape[0]
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self):
        order = self.rng.permutation(self.train_nodes.shape[0])
        nodes = self.train_nodes[order]
        pending = 0
        submitted = 0
        total = len(self)
        bs = self.batch_size
        for b in range(total):
            batch = np.ascontiguousarray(nodes[b * bs : (b + 1) * bs])
            self._submit(batch)
            pending += 1
            submitted += 1
            # keep the pipeline primed but bounded
            if pending >= 3 or submitted == total:
                while pending > (0 if submitted == total else 2):
                    yield self._pop()
                    pending -= 1
        while pending > 0:
            yield self._pop()
            pending -= 1

    def sample_batch(self, batch: np.ndarray) -> SplitBatch:
        batch = np.ascontiguousarray(batch, dtype=np.int64)
        self._submit(batch)
        return self._pop()

    def _submit(self, batch: np.ndarray):
        self._lib.occ_submit(self._handle, batch.ctypes.data,
                             batch.shape[0], self._next_submit_seq)
        self._next_submit_seq += 1

    # -- internals ---------------------------------------------------------

    def _alloc_fields(self):
        P, L = self.P, len(self.fanouts)
        PE = self.P_emit  # emitted partition rows (multi-host work shard)
        caps = self.caps
        fields = []
        deg_caps = self.caps["deg_caps"]
        for l in range(L):
            if l == 0 and self.device_innermost:
                fields.append({"dst_global": np.empty(
                    (PE, caps["dst_caps"][0]), np.int32
                )})
                continue
            E, S, O = caps["edge_caps"][l], caps["shuffle_caps"][l], caps["out_caps"][l]
            f = {}
            if self._coo_l[l]:
                f["edge_src"] = np.empty((PE, E), np.int32)
                f["edge_dst"] = np.empty((PE, E), np.int32)
            f |= {
                "push": np.empty((PE, P, S), np.int32),
                "recv": np.empty((PE, P, S), np.int32),
                "owned_idx": np.empty((PE, O), np.int32),
                "owned_deg": np.empty((PE, O), np.float32),
                "self_idx": np.empty((PE, O), np.int32),
                "owned_mask": np.empty((PE, O), np.uint8),
                "num_owned": np.empty((PE,), np.int32),
            }
            if deg_caps[l] > 0:
                f["nbr"] = np.empty(
                    (PE, deg_caps[l], caps["dst_caps"][l]), np.int32
                )
            fields.append(f)
        extra = {}
        if self.emit_input:
            extra["input_nodes"] = np.empty(
                (PE, caps["frame_caps"][0]), np.int32
            )
        extra["targets"] = np.empty((PE, caps["out_caps"][-1]), np.int32)
        # refresh stays ALL-P: cache-tail bookkeeping is global
        extra["refresh_nodes"] = np.empty(
            (P, max(self.refresh_cap, 1)), np.int32
        )
        return fields, extra

    def _pop(self) -> SplitBatch:
        """Deliver samples in SUBMISSION order: multi-worker completion is
        unordered, but multi-host replicated sampling (and reproducibility
        in general) needs host-side order — out-of-order arrivals are
        buffered until their turn."""
        want = self._next_deliver_seq
        self._next_deliver_seq += 1
        while want not in self._reorder:
            seq, batch = self._pop_any()
            self._reorder[seq] = batch
        batch = self._reorder.pop(want)
        if isinstance(batch, _SlicerError):
            # Raise IN TURN: seqs after the failed one stay buffered and
            # are delivered in order if the caller recovers.
            batch.raise_()
        if self.gather_tail:
            # Workers already gathered+cast the tail rows; the consumer
            # only forwards the buffer (bucketed) to the device.
            counts = (batch._refresh_nodes >= 0).sum(axis=1)
            buf = batch._tail_feats
            self.cache.apply_tail_gathered(buf, counts)
            self._tail_pool.append(buf)
            del batch._tail_feats
        elif self.cache is not None and hasattr(self.cache, "apply_tail"):
            self.cache.apply_tail(batch._refresh_nodes)
        del batch._refresh_nodes
        return batch

    def _get_tail_buf(self) -> np.ndarray:
        if self._tail_pool:
            return self._tail_pool.pop()
        return np.empty(self._tail_shape, self._tail_dtype)

    # -- packed transfer path ---------------------------------------------
    # The C++ service writes every field into ONE host arena; the whole
    # arena crosses host->device in a single transfer and a jit'd unpack
    # slices/bitcasts the fields device-side. ~35 small transfers per
    # batch become 1 (plus the cache tail) — transfer-count latency is
    # what dominates staging on hosts with slow interconnects.

    def _build_layout(self):
        P, L = self.P, len(self.fanouts)
        PE = self.P_emit
        caps = self.caps
        layout = []
        off = 0

        def add(name, l, shape, kind):
            nonlocal off
            n = int(np.prod(shape))
            words = n if kind != "u8" else -(-n // 4)
            layout.append((name, l, off, tuple(shape), kind))
            off += words

        deg_caps = caps["deg_caps"]
        for l in range(L):
            if l == 0 and self.device_innermost:
                # One field: the dst frame's global ids — the device
                # synthesizes everything else from the resident CSR.
                add("dst_global", 0, (PE, caps["dst_caps"][0]), "i32")
                continue
            E = caps["edge_caps"][l]
            S = caps["shuffle_caps"][l]
            O = caps["out_caps"][l]
            if self._coo_l[l]:
                add("edge_src", l, (PE, E), "i32")
                add("edge_dst", l, (PE, E), "i32")
            add("push", l, (PE, P, S), "i32")
            add("recv", l, (PE, P, S), "i32")
            add("owned_idx", l, (PE, O), "i32")
            add("owned_deg", l, (PE, O), "f32")
            add("self_idx", l, (PE, O), "i32")
            add("owned_mask", l, (PE, O), "u8")
            add("num_owned", l, (PE,), "i32")
            if deg_caps[l] > 0:
                add("nbr", l, (PE, deg_caps[l], caps["dst_caps"][l]), "i32")
        if self.emit_input:
            add("input_nodes", None, (PE, caps["frame_caps"][0]), "i32")
        add("targets", None, (PE, caps["out_caps"][-1]), "i32")
        add("refresh", None, (P, max(self.refresh_cap, 1)), "i32")
        self._layout = layout
        self._arena_words = off

    def _make_unpack(self):
        import jax
        import jax.numpy as jnp

        layout = self._layout
        caps = self.caps
        P, L = self.P, len(self.fanouts)
        src_cap0 = (self.cache_plan.frame_cap
                    if self.cache_plan is not None
                    else caps["frame_caps"][0])

        def field(arena, name, l):
            for n, li, off, shape, kind in layout:
                if n == name and li == l:
                    count = int(np.prod(shape))
                    if kind == "i32":
                        return arena[off : off + count].reshape(shape)
                    if kind == "f32":
                        return jax.lax.bitcast_convert_type(
                            arena[off : off + count], jnp.float32
                        ).reshape(shape)
                    words = -(-count // 4)
                    by = jax.lax.bitcast_convert_type(
                        arena[off : off + words], jnp.uint8
                    ).reshape(-1)[:count]
                    return (by != 0).reshape(shape)
            raise KeyError((name, l))

        deg_caps = caps["deg_caps"]

        coo_l = self._coo_l
        emit_input = self.emit_input
        device_innermost = self.device_innermost
        fanouts = self.fanouts  # sampling order: model layer l <- L-1-l

        def unpack(arena, labels_all):
            layers = []
            for l in range(L):
                if l == 0 and device_innermost:
                    layers.append(SplitLayer(
                        dst_global=field(arena, "dst_global", 0),
                        src_cap=src_cap0,
                        dst_cap=caps["dst_caps"][0],
                        out_cap=caps["out_caps"][0],
                        fanout=fanouts[-1],
                    ))
                    continue
                layers.append(SplitLayer(
                    edge_src=(field(arena, "edge_src", l)
                              if coo_l[l] else None),
                    edge_dst=(field(arena, "edge_dst", l)
                              if coo_l[l] else None),
                    push_idx=field(arena, "push", l),
                    recv_idx=field(arena, "recv", l),
                    owned_idx=field(arena, "owned_idx", l),
                    owned_deg=field(arena, "owned_deg", l),
                    self_idx=field(arena, "self_idx", l),
                    owned_mask=field(arena, "owned_mask", l),
                    num_owned=field(arena, "num_owned", l),
                    nbr_idx=(field(arena, "nbr", l)
                             if deg_caps[l] > 0 else None),
                    src_cap=(src_cap0 if l == 0 else caps["frame_caps"][l]),
                    dst_cap=caps["dst_caps"][l],
                    out_cap=caps["out_caps"][l],
                    fanout=fanouts[L - 1 - l],
                ))
            targets = field(arena, "targets", None)
            # labels looked up on device from the resident label table
            labels = jnp.where(
                targets >= 0,
                labels_all[jnp.maximum(targets, 0)],
                -1,
            )
            return SplitBatch(
                layers=layers,
                input_nodes=(field(arena, "input_nodes", None)
                             if emit_input else None),
                labels=labels,
                target_nodes=targets,
            )

        return jax.jit(unpack)

    def _pop_packed(self):
        import jax.numpy as jnp

        if self._layout is None:
            self._build_layout()
            self._unpack_fn = self._make_unpack()
            self._labels_dev = jnp.asarray(
                self.graph.labels.astype(np.int32)
            )
        arena = np.empty(self._arena_words, np.int32)
        base = arena.ctypes.data
        ptrs = [base + off * 4 for (_, _, off, _, _) in self._layout]
        tail_buf = None
        if self.gather_tail:
            tail_buf = self._get_tail_buf()
            ptrs.append(tail_buf.ctypes.data)
        arr = (ctypes.c_void_p * len(ptrs))(*ptrs)
        seq = ctypes.c_int64(-1)
        err = self._lib.occ_next(self._handle, arr, ctypes.byref(seq))
        if err != 0:
            if tail_buf is not None:
                self._tail_pool.append(tail_buf)
            return seq.value, _SlicerError(err)
        # Host-side view of the refresh list BEFORE upload (apply_tail
        # gathers features from host RAM).
        rname, _, roff, rshape, _ = self._layout[-1]
        refresh = arena[roff : roff + int(np.prod(rshape))].reshape(rshape)
        batch = self._unpack_fn(jnp.asarray(arena), self._labels_dev)
        batch._refresh_nodes = refresh
        if tail_buf is not None:
            batch._tail_feats = tail_buf
        return seq.value, batch

    def _pop_any(self):
        if self.packed:
            return self._pop_packed()
        import jax.numpy as jnp

        fields, extra = self._alloc_fields()
        ptrs = []
        order = ["dst_global", "edge_src", "edge_dst", "push", "recv",
                 "owned_idx", "owned_deg", "self_idx", "owned_mask",
                 "num_owned", "nbr"]
        for layer in fields:
            for k in order:
                if k in layer:
                    ptrs.append(layer[k].ctypes.data)
        if self.emit_input:
            ptrs.append(extra["input_nodes"].ctypes.data)
        ptrs.append(extra["targets"].ctypes.data)
        ptrs.append(extra["refresh_nodes"].ctypes.data)
        tail_buf = None
        if self.gather_tail:
            tail_buf = self._get_tail_buf()
            ptrs.append(tail_buf.ctypes.data)
        arr = (ctypes.c_void_p * len(ptrs))(*ptrs)
        seq = ctypes.c_int64(-1)
        err = self._lib.occ_next(self._handle, arr, ctypes.byref(seq))
        if err != 0:
            if tail_buf is not None:
                self._tail_pool.append(tail_buf)
            return seq.value, _SlicerError(err)
        caps = self.caps
        layers = []
        for l, f in enumerate(fields):
            if "dst_global" in f:
                layers.append(SplitLayer(
                    dst_global=jnp.asarray(f["dst_global"]),
                    src_cap=self.cache_plan.frame_cap,
                    dst_cap=caps["dst_caps"][0],
                    out_cap=caps["out_caps"][0],
                    fanout=self.fanouts[-1],
                ))
                continue
            layers.append(SplitLayer(
                edge_src=(jnp.asarray(f["edge_src"])
                          if "edge_src" in f else None),
                edge_dst=(jnp.asarray(f["edge_dst"])
                          if "edge_dst" in f else None),
                push_idx=jnp.asarray(f["push"]),
                recv_idx=jnp.asarray(f["recv"]),
                owned_idx=jnp.asarray(f["owned_idx"]),
                owned_deg=jnp.asarray(f["owned_deg"]),
                self_idx=jnp.asarray(f["self_idx"]),
                owned_mask=jnp.asarray(f["owned_mask"].astype(bool)),
                num_owned=jnp.asarray(f["num_owned"]),
                nbr_idx=(jnp.asarray(f["nbr"]) if "nbr" in f else None),
                src_cap=(self.cache_plan.frame_cap if (l == 0 and self.cache_plan is not None)
                         else caps["frame_caps"][l]),
                dst_cap=caps["dst_caps"][l],
                out_cap=caps["out_caps"][l],
                fanout=self.fanouts[len(self.fanouts) - 1 - l],
            ))
        targets = extra["targets"]
        labels = np.where(
            targets >= 0,
            self.graph.labels[np.maximum(targets, 0)].astype(np.int32),
            -1,
        )
        batch = SplitBatch(
            layers=layers,
            input_nodes=(jnp.asarray(extra["input_nodes"])
                         if self.emit_input else None),
            labels=jnp.asarray(labels),
            target_nodes=jnp.asarray(targets),
        )
        # Cache tails are applied at DELIVERY time (in _pop), preserving
        # per-batch frame pairing under reordering.
        batch._refresh_nodes = extra["refresh_nodes"]
        if tail_buf is not None:
            batch._tail_feats = tail_buf
        return seq.value, batch

    def stats(self) -> dict:
        """Accumulated worker phase timers (reference Timer analog)."""
        buf = np.zeros(4, dtype=np.float64)
        self._lib.occ_stats(self._handle, buf.ctypes.data)
        n = max(buf[3], 1.0)
        return {
            "sample_s_total": float(buf[0]),
            "slice_s_total": float(buf[1]),
            "tail_gather_s_total": float(buf[2]),
            "samples": int(buf[3]),
            "sample_s_per_batch": float(buf[0] / n),
            "slice_s_per_batch": float(buf[1] / n),
            "tail_gather_s_per_batch": float(buf[2] / n),
        }

    def close(self):
        if not self._closed and self._handle:
            self._lib.occ_destroy(self._handle)
            self._closed = True

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
