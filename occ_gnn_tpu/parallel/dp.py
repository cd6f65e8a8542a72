"""Data-parallel (DDP-equivalent) training over the device mesh.

Baseline mode mirroring the reference's no-cache DDP trainer
(/root/reference/python/no_cache_multi_gpu.py:56-148): train nodes are
sharded across devices, each device samples and trains on its own
minibatches, and gradients are globally reduced — NCCL allreduce becomes
the psum the shard_map transpose inserts for replicated params.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from occ_gnn_tpu.ops.blocks import SampledBatch
from occ_gnn_tpu.parallel.model import _local_ce, _unstack


def stack_batches(batches: list[SampledBatch]) -> SampledBatch:
    """Stack per-device SampledBatches (identical capacities) leading-axis P."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *batches
    )


def make_dp_train_step(model, optimizer: optax.GradientTransformation, mesh):
    def make_loss_body(with_rng: bool):
        def loss_body(params, blocks, labels, x0, rng=None):
            local = SampledBatch(
                blocks=[_unstack(b) for b in blocks],
                input_nodes=None,
                labels=labels[0],
            )
            if with_rng:
                rng = jax.random.fold_in(rng, jax.lax.axis_index("p"))
                logits = model.apply(params, local, x0[0], train=True,
                                     rng=rng)
            else:
                logits = model.apply(params, local, x0[0])
            nll, cnt, correct = _local_ce(logits, local.labels)
            nll = jax.lax.psum(nll, "p")
            cnt = jax.lax.psum(cnt, "p")
            correct = jax.lax.psum(correct, "p")
            return nll / jnp.maximum(cnt, 1), (correct, cnt)

        return loss_body

    mapped = jax.shard_map(
        make_loss_body(False),
        mesh=mesh,
        in_specs=(P(), P("p"), P("p"), P("p")),
        out_specs=(P(), (P(), P())),
        check_vma=False,
    )
    mapped_rng = jax.shard_map(
        make_loss_body(True),
        mesh=mesh,
        in_specs=(P(), P("p"), P("p"), P("p"), P()),
        out_specs=(P(), (P(), P())),
        check_vma=False,
    )

    @jax.jit
    def step(params, opt_state, stacked: SampledBatch, x0, rng=None):
        from occ_gnn_tpu.parallel.model import _check_dropout_rng

        _check_dropout_rng(model, rng)
        if rng is None:
            fn = lambda prm: mapped(prm, stacked.blocks, stacked.labels, x0)
        else:
            fn = lambda prm: mapped_rng(
                prm, stacked.blocks, stacked.labels, x0, rng
            )
        (loss, (correct, cnt)), grads = jax.value_and_grad(
            fn, has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, correct, cnt

    return step
