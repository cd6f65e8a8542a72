"""Single-chip training step construction (jit'd loss/grad/update).

The distributed (split-parallel) step lives in occ_gnn_tpu.parallel.split;
this module is the 1-chip path used by baselines and correctness tests
(structure of reference python/train.py:50-88, minus the 4-GPU plumbing).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
import optax

from occ_gnn_tpu.models.common import masked_accuracy, masked_cross_entropy
from occ_gnn_tpu.ops.blocks import SampledBatch


def gather_features(features: np.ndarray, input_nodes) -> jax.Array:
    """Host gather of the input frame's features (padding rows -> 0)."""
    idx = np.asarray(input_nodes)
    safe = np.maximum(idx, 0)
    out = features[safe]
    out[idx < 0] = 0.0
    return jnp.asarray(out)


def make_train_step(model, optimizer: optax.GradientTransformation):
    def loss_fn(params, batch: SampledBatch, x0, rng):
        logits = model.apply(params, batch, x0, train=True, rng=rng)
        loss = masked_cross_entropy(logits, batch.labels)
        return loss, logits

    @jax.jit
    def step(params, opt_state, batch: SampledBatch, x0, rng):
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, x0, rng
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        correct, total = masked_accuracy(logits, batch.labels)
        return params, opt_state, loss, correct, total

    return step


def make_eval_step(model):
    @jax.jit
    def step(params, batch: SampledBatch, x0):
        logits = model.apply(params, batch, x0, train=False)
        loss = masked_cross_entropy(logits, batch.labels)
        correct, total = masked_accuracy(logits, batch.labels)
        return loss, correct, total

    return step
