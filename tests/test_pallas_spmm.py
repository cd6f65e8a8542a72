"""Pallas sorted-segment-sum kernel vs XLA golden (interpret mode on CPU;
the compiled path runs on real TPU via bench/OCC_USE_PALLAS)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


def _case(E, D, H, S, cap, seed=0):
    rng = np.random.default_rng(seed)
    dst = np.sort(rng.integers(0, D, size=E)).astype(np.int32)
    src = rng.integers(0, S, size=E).astype(np.int32)
    dstp = np.concatenate([dst, np.full(cap - E, D, np.int32)])
    srcp = np.concatenate([src, np.zeros(cap - E, np.int32)])
    x = rng.standard_normal((S, H)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(srcp), jnp.asarray(dstp)


def test_spmm_sum_dispatches_to_pallas():
    from occ_gnn_tpu.ops import config, segment

    x, src, dst = _case(500, 100, 16, 80, 512)
    config.set_use_pallas(True)
    try:
        out = segment.spmm_sum(x, src, dst, 100)
    finally:
        config.set_use_pallas(False)
    golden = jax.ops.segment_sum(x[src], dst, num_segments=100)
    np.testing.assert_allclose(np.asarray(out), np.asarray(golden),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("E,D,H,S,cap", [
    (3000, 700, 64, 500, 4096),
    (100, 10, 8, 50, 256),
    (5000, 300, 128, 400, 6000),
])
def test_blocked_pallas_matches_xla(E, D, H, S, cap):
    from occ_gnn_tpu.ops.pallas_spmm_blocked import spmm_sum_blocked

    x, src, dst = _case(E, D, H, S, cap)
    out = spmm_sum_blocked(x, src, dst, D)
    golden = jax.ops.segment_sum(x[src], dst, num_segments=D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(golden),
                               rtol=1e-5, atol=1e-5)


def test_blocked_pallas_grad():
    from occ_gnn_tpu.ops.pallas_spmm_blocked import spmm_sum_blocked

    x, src, dst = _case(2000, 400, 32, 300, 2048)
    g1 = jax.grad(lambda xx: spmm_sum_blocked(xx, src, dst, 400).sum())(x)
    g2 = jax.grad(
        lambda xx: jax.ops.segment_sum(xx[src], dst, num_segments=400).sum()
    )(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5,
                               atol=1e-5)
