"""Shared functional-model utilities: init helpers, masked loss, accuracy."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def xavier_uniform(key, shape, gain: float = 1.0, dtype=jnp.float32):
    """Xavier/Glorot uniform (matches torch nn.init.xavier_uniform_ with
    gain=calculate_gain('relu') used at reference dist_sageconv.py:33-39)."""
    fan_in, fan_out = shape[-2], shape[-1]
    limit = gain * jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


RELU_GAIN = 2.0 ** 0.5


def linear_init(key, in_dim: int, out_dim: int, gain: float = RELU_GAIN):
    wk, _ = jax.random.split(key)
    return {
        "w": xavier_uniform(wk, (in_dim, out_dim), gain=gain),
        "b": jnp.zeros((out_dim,), jnp.float32),
    }


def linear(params, x):
    return x @ params["w"] + params["b"]


def masked_cross_entropy(logits: jax.Array, labels: jax.Array):
    """Mean CE over rows whose label != -1 (padding rows are masked).

    Equivalent to torch.nn.CrossEntropyLoss over the valid rows
    (reference train.py:41,81-86 sums per-GPU CE losses).
    """
    valid = labels >= 0
    safe = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / count


def masked_accuracy(logits: jax.Array, labels: jax.Array):
    valid = labels >= 0
    pred = jnp.argmax(logits, axis=-1)
    correct = jnp.sum(jnp.where(valid, pred == labels, False))
    return correct, jnp.sum(valid)


def dropout(key, x, rate: float, deterministic: bool):
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
