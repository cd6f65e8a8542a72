"""Device-side dense neighbor sampling — the Quiver-baseline analog.

The reference's Quiver baseline (/root/reference/python/quiver-baseline.py:
139-163) moves sampling onto the accelerator (quiver GPU sampler) and keeps
a device-replicated feature table (``quiver.Feature``), training DDP-style.
The TPU-idiomatic counterpart implemented here goes further: the ENTIRE
step — fanout sampling, feature gather, forward, backward, optimizer — is
one jit'd XLA program. Zero host work in the training loop.

Design (TPU-first, not a translation):

  * The CSR graph lives on device (replicated). Per layer, each frontier
    node draws exactly ``fanout`` neighbors uniformly *with replacement*
    (``rand % degree``, the reference C++ slicer's draw at
    /root/reference/cslicer/slicer.cpp:6-22 — but note that slicer takes
    ALL neighbors exactly once when degree < fanout, while this path
    always draws ``fanout`` times with replacement: for low-degree nodes
    the neighbor-mean is still unbiased, with higher variance than the
    host NeighborSampler's take-all behavior). Zero-degree nodes draw
    themselves (equivalent to the materialized self-loop for isolated
    nodes, sampler.py:202-203).
  * No deduplication: the frontier after layer l is
    ``concat(frontier, sampled.flatten())`` — a *dense* multiset of size
    ``S_{l} = S_{l-1} * (1 + fanout_l)``. Every shape is static, every op
    is a gather/reshape/matmul — nothing blocks XLA fusion or MXU tiling.
    The redundancy this creates is exactly the redundancy split-parallelism
    (parallel/split.py) exists to eliminate; this module is the baseline
    that quantifies it (experiments exp4/exp6 axis).
  * Aggregation is a dense mean over the fanout axis: with exactly K
    sampled neighbors plus the self row, ``mean = (x_self + sum_K x_nbr)
    / (K + 1)`` — the same mean-with-self-loop numerics as the padded-COO
    path, with no scatter at all.
  * Data parallelism: batch sharded over the mesh, features/CSR/params
    replicated, gradients psum'd by the shard_map transpose (the NCCL
    allreduce of the reference baseline, no_cache_multi_gpu.py:63-66).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from occ_gnn_tpu.models.common import dropout, linear
from occ_gnn_tpu.parallel.model import _local_ce


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeviceCSR:
    """Replicated on-device CSR (in-neighbor lists, message sources)."""

    indptr: jax.Array   # i32[N + 1]
    indices: jax.Array  # i32[E]


def device_csr(graph) -> DeviceCSR:
    """Upload a host Graph's CSR to device as i32 (node ids < 2^31)."""
    if graph.num_nodes >= np.iinfo(np.int32).max:
        raise ValueError("device sampler requires node ids < 2^31")
    return DeviceCSR(
        indptr=jnp.asarray(graph.indptr.astype(np.int32)),
        indices=jnp.asarray(graph.indices.astype(np.int32)),
    )


def sample_neighbors_dense(
    csr: DeviceCSR, frontier: jax.Array, fanout: int, key: jax.Array
) -> jax.Array:
    """Draw exactly ``fanout`` neighbors per frontier node, with replacement.

    Returns i32[len(frontier), fanout]. Zero-degree nodes yield themselves.
    """
    start = csr.indptr[frontier]
    deg = csr.indptr[frontier + 1] - start
    r = jax.random.randint(
        key, (frontier.shape[0], fanout), 0, jnp.iinfo(jnp.int32).max
    )
    offset = r % jnp.maximum(deg, 1)[:, None]
    nbr = csr.indices[start[:, None] + offset]
    return jnp.where(deg[:, None] > 0, nbr, frontier[:, None])


def dense_frontiers(
    csr: DeviceCSR, targets: jax.Array, fanouts: list[int], key: jax.Array
) -> list[jax.Array]:
    """All layer frontiers, outermost-first (frontiers[0] == targets).

    ``frontiers[l] = concat(frontiers[l-1], neighbors.flatten())`` — the
    self rows of layer l occupy the prefix, so no index bookkeeping is
    needed between layers (the dense analog of blocks.py's dst-first
    frame ordering).
    """
    frontier = targets
    out = [frontier]
    for l, fanout in enumerate(fanouts):
        sub = jax.random.fold_in(key, l)
        nbr = sample_neighbors_dense(csr, frontier, fanout, sub)
        frontier = jnp.concatenate([frontier, nbr.reshape(-1)])
        out.append(frontier)
    return out


def dense_sage_forward(
    params: dict,
    x_deepest: jax.Array,
    fanouts: list[int],
    *,
    dropout_rate: float = 0.0,
    train: bool = False,
    rng: jax.Array | None = None,
    dtype=jnp.float32,
) -> jax.Array:
    """SAGE forward over dense frontiers (params from SAGEModel.init).

    ``x_deepest`` holds features for the deepest frontier (dense multiset
    order). Layer math matches models/sage.py: h = W @ concat(self, mean).
    """
    num_layers = len(fanouts)
    sizes = [1]
    for fanout in fanouts:
        sizes.append(sizes[-1] * (1 + fanout))
    total = x_deepest.shape[0]
    if total % sizes[-1]:
        raise ValueError(
            f"x_deepest rows ({total}) not a multiple of the dense frontier "
            f"growth factor {sizes[-1]} for fanouts {fanouts}"
        )
    batch = total // sizes[-1]
    x = x_deepest
    for i in range(num_layers):
        m = num_layers - 1 - i          # sampled layer consumed (outer idx)
        fanout = fanouts[m]
        n_self = batch * sizes[m]
        x_self = x[:n_self].astype(jnp.float32)
        x_nbr = x[n_self:].reshape(n_self, fanout, -1).astype(jnp.float32)
        mean = (x_self + x_nbr.sum(axis=1)) / (fanout + 1.0)
        x = linear(params[f"layer_{i}"],
                   jnp.concatenate([x_self, mean], axis=-1))
        if i != num_layers - 1:
            x = jax.nn.relu(x)
            if train and dropout_rate > 0.0:
                rng, sub = jax.random.split(rng)
                x = dropout(sub, x, dropout_rate, deterministic=False)
            x = x.astype(dtype)
    return x


def dense_logits(
    params, csr, features, targets, fanouts, key, **fwd_kwargs
) -> jax.Array:
    """Fused sample + gather + forward for one device's targets.

    ``targets`` may contain -1 padding (clamped for the gather; mask the
    loss with labels == -1).
    """
    safe_targets = jnp.maximum(targets, 0)
    frontiers = dense_frontiers(csr, safe_targets, fanouts,
                                jax.random.fold_in(key, 0x5A))
    x_deepest = features[frontiers[-1]]
    return dense_sage_forward(params, x_deepest, fanouts, **fwd_kwargs)


def make_device_sample_train_step(
    fanouts: list[int],
    optimizer: optax.GradientTransformation,
    mesh,
    dropout_rate: float = 0.0,
    dtype=jnp.float32,
):
    """One jit'd program: per-device sampling + forward/backward + adam.

    Inputs per call: ``targets``/``labels`` i32[P, B_local] sharded over
    the mesh's 'p' axis; ``csr``/``features``/``params`` replicated;
    ``key`` replicated (folded with the device index so replicas draw
    independent neighborhoods, like per-rank DGL samplers).
    """
    fanouts = list(fanouts)

    def loss_body(params, csr, features, targets, labels, key):
        idx = jax.lax.axis_index("p")
        key = jax.random.fold_in(key[0], idx)
        rng, sub = jax.random.split(key)
        logits = dense_logits(
            params, csr, features, targets[0], fanouts, sub,
            dropout_rate=dropout_rate, train=True, rng=rng, dtype=dtype,
        )
        nll, cnt, correct = _local_ce(logits, labels[0])
        nll = jax.lax.psum(nll, "p")
        cnt = jax.lax.psum(cnt, "p")
        correct = jax.lax.psum(correct, "p")
        return nll / jnp.maximum(cnt, 1), (correct, cnt)

    mapped = jax.shard_map(
        loss_body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("p"), P("p"), P("p")),
        out_specs=(P(), (P(), P())),
        check_vma=False,
    )

    @jax.jit
    def step(params, opt_state, csr, features, targets, labels, keys):
        (loss, (correct, cnt)), grads = jax.value_and_grad(
            lambda prm: mapped(prm, csr, features, targets, labels, keys),
            has_aux=True,
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, correct, cnt

    return step


class DeviceSampleTrainer:
    """Epoch driver for the device-sampled (quiver-style) baseline.

    The host's only job is handing the next shuffled i32 target/label
    shards to the device — everything else runs inside ``step``.
    """

    def __init__(self, graph, fanouts, batch_size, mesh, optimizer,
                 seed=0, dropout_rate=0.0, dtype=jnp.float32,
                 features=None):
        self.graph = graph
        self.fanouts = list(fanouts)
        self.mesh = mesh
        self.num_devices = mesh.devices.size
        if batch_size % self.num_devices:
            raise ValueError("batch_size must be divisible by the mesh size")
        self.per_dev = batch_size // self.num_devices
        self.csr = device_csr(graph)
        feats = graph.features if features is None else features
        self.features = jnp.asarray(feats, dtype=dtype)
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        self.step_fn = make_device_sample_train_step(
            fanouts, optimizer, mesh, dropout_rate=dropout_rate, dtype=dtype
        )

    def epoch_batches(self, nodes: np.ndarray):
        """Shuffled [P, B_local] target/label i32 shards (last ragged
        batch padded with -1 labels)."""
        order = self.rng.permutation(nodes.shape[0])
        nodes = nodes[order]
        bs = self.per_dev * self.num_devices
        for i in range(0, nodes.shape[0], bs):
            chunk = nodes[i : i + bs]
            targets = np.full((bs,), 0, dtype=np.int32)
            labels = np.full((bs,), -1, dtype=np.int32)
            targets[: chunk.shape[0]] = chunk
            labels[: chunk.shape[0]] = self.graph.labels[chunk]
            yield (
                targets.reshape(self.num_devices, self.per_dev),
                labels.reshape(self.num_devices, self.per_dev),
            )

    def train_epoch(self, params, opt_state, nodes: np.ndarray):
        correct = total = 0
        loss = jnp.float32(0)
        for targets, labels in self.epoch_batches(nodes):
            self.key, sub = jax.random.split(self.key)
            keys = jnp.broadcast_to(sub, (self.num_devices,) + sub.shape)
            params, opt_state, loss, c, t = self.step_fn(
                params, opt_state, self.csr, self.features,
                jnp.asarray(targets), jnp.asarray(labels), keys,
            )
            correct += int(c)
            total += int(t)
        return params, opt_state, float(loss), correct, total
