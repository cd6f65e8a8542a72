"""Golden parity of segment/SpMM ops vs a torch reference.

The reference validated its CUDA kernels against PyTorch/DGL golden dumps
(tests/gcn_test.py -> full_graph_gcn.cc); here torch-cpu computes the
golden values inline and the JAX ops must match to float tolerance,
including padding edges and zero-degree rows.
"""

import numpy as np
import torch

import jax.numpy as jnp

from occ_gnn_tpu.ops.segment import (
    segment_mean,
    segment_softmax,
    segment_sum,
    spmm_mean,
    spmm_sum,
)


def _random_coo(rng, num_src, num_dst, num_edges, edge_cap):
    src = rng.integers(0, num_src, size=num_edges).astype(np.int32)
    dst = np.sort(rng.integers(0, num_dst, size=num_edges)).astype(np.int32)
    pad = edge_cap - num_edges
    src_p = np.concatenate([src, np.zeros(pad, np.int32)])
    dst_p = np.concatenate([dst, np.full(pad, num_dst, np.int32)])
    return src, dst, src_p, dst_p


def test_spmm_sum_matches_torch():
    rng = np.random.default_rng(0)
    S, D, E, CAP, H = 40, 25, 200, 256, 8
    src, dst, src_p, dst_p = _random_coo(rng, S, D, E, CAP)
    x = rng.standard_normal((S, H)).astype(np.float32)

    golden = torch.zeros(D, H)
    golden.index_add_(0, torch.tensor(dst, dtype=torch.long),
                      torch.tensor(x)[torch.tensor(src, dtype=torch.long)])

    out = spmm_sum(jnp.asarray(x), jnp.asarray(src_p), jnp.asarray(dst_p), D)
    np.testing.assert_allclose(np.asarray(out), golden.numpy(), rtol=1e-5,
                               atol=1e-5)


def test_spmm_mean_matches_torch_with_zero_degree():
    rng = np.random.default_rng(1)
    S, D, E, CAP, H = 30, 20, 60, 128, 4
    src, dst, src_p, dst_p = _random_coo(rng, S, D, E, CAP)
    # Force some zero-degree destinations.
    dst = np.where(dst == 3, 4, dst)
    dst_p[:E] = np.sort(dst)
    order = np.argsort(dst)
    src_p[:E] = src[order]
    x = rng.standard_normal((S, H)).astype(np.float32)

    t_src = torch.tensor(src_p[:E], dtype=torch.long)
    t_dst = torch.tensor(dst_p[:E], dtype=torch.long)
    total = torch.zeros(D, H).index_add_(0, t_dst, torch.tensor(x)[t_src])
    count = torch.zeros(D).index_add_(0, t_dst, torch.ones(E))
    golden = total / count.clamp(min=1.0)[:, None]
    assert (count == 0).any()  # the zero-degree case is actually exercised

    out = spmm_mean(jnp.asarray(x), jnp.asarray(src_p), jnp.asarray(dst_p), D)
    np.testing.assert_allclose(np.asarray(out), golden.numpy(), rtol=1e-5,
                               atol=1e-5)


def test_segment_mean_vs_manual():
    rng = np.random.default_rng(2)
    ids = np.sort(rng.integers(0, 10, size=50)).astype(np.int32)
    data = rng.standard_normal((50, 3)).astype(np.float32)
    out = segment_mean(jnp.asarray(data), jnp.asarray(ids), 10)
    for s in range(10):
        rows = data[ids == s]
        expect = rows.mean(0) if rows.size else np.zeros(3)
        np.testing.assert_allclose(np.asarray(out)[s], expect, rtol=1e-5,
                                   atol=1e-6)


def test_segment_softmax_matches_torch():
    rng = np.random.default_rng(3)
    E, D, CAP = 100, 12, 128
    ids = np.sort(rng.integers(0, D, size=E)).astype(np.int32)
    ids_p = np.concatenate([ids, np.full(CAP - E, D, np.int32)])
    scores = (5 * rng.standard_normal((E,))).astype(np.float32)
    scores_p = np.concatenate([scores, np.zeros(CAP - E, np.float32)])

    golden = np.zeros(E, np.float32)
    t = torch.tensor(scores)
    for s in range(D):
        m = ids == s
        if m.any():
            golden[m] = torch.softmax(t[m], dim=0).numpy()

    out = np.asarray(
        segment_softmax(jnp.asarray(scores_p), jnp.asarray(ids_p), D)
    )
    np.testing.assert_allclose(out[:E], golden, rtol=1e-5, atol=1e-6)
    # Each non-empty segment sums to 1; padding contributes nothing.
    sums = np.asarray(
        segment_sum(jnp.asarray(out), jnp.asarray(ids_p), D)
    )
    present = np.unique(ids)
    np.testing.assert_allclose(sums[present], 1.0, rtol=1e-5)


def test_spmm_grad_flows():
    import jax

    rng = np.random.default_rng(4)
    S, D, E, CAP, H = 20, 10, 40, 64, 4
    _, _, src_p, dst_p = _random_coo(rng, S, D, E, CAP)
    x = jnp.asarray(rng.standard_normal((S, H)).astype(np.float32))

    def f(x):
        return spmm_mean(x, jnp.asarray(src_p), jnp.asarray(dst_p), D).sum()

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_spmm_sym_matches_dense_reference():
    """spmm_sym == dense A_hat @ x with A_hat[v,u] = 1/sqrt(d_out(u) d_in(v)),
    block-local degrees, padded edges contributing nothing."""
    from occ_gnn_tpu.ops.segment import spmm_sym

    rng = np.random.default_rng(7)
    S, D, E, CAP, H = 30, 18, 120, 160, 6
    src, dst, src_p, dst_p = _random_coo(rng, S, D, E, CAP)
    x = rng.standard_normal((S, H)).astype(np.float32)

    deg_in = np.bincount(dst, minlength=D).astype(np.float32)
    deg_out = np.bincount(src, minlength=S).astype(np.float32)
    golden = np.zeros((D, H), np.float32)
    for u, v in zip(src, dst):
        golden[v] += x[u] / np.sqrt(max(deg_out[u], 1) * max(deg_in[v], 1))

    out = np.asarray(spmm_sym(
        jnp.asarray(x), jnp.asarray(src_p), jnp.asarray(dst_p), D, S
    ))
    np.testing.assert_allclose(out, golden, rtol=1e-4, atol=1e-5)


def test_gcn_sym_variant_runs():
    """GCNModel(norm='sym') trains a step and differs from norm='mean'."""
    import jax

    from occ_gnn_tpu.models import get_model
    from occ_gnn_tpu.ops.blocks import block_from_numpy
    from occ_gnn_tpu.ops.blocks import SampledBatch

    rng = np.random.default_rng(3)
    n_src, n_dst, E = 24, 10, 60
    e_src = rng.integers(0, n_src, E).astype(np.int64)
    e_dst = np.sort(rng.integers(0, n_dst, E)).astype(np.int64)
    blk = block_from_numpy(e_src, e_dst, num_src=n_src, num_dst=n_dst,
                           edge_cap=64, dst_cap=16, src_cap=32)
    batch = SampledBatch(blocks=[blk],
                         input_nodes=jnp.zeros(32, jnp.int32),
                         labels=jnp.zeros(16, jnp.int32))
    x0 = jnp.asarray(rng.standard_normal((32, 5)).astype(np.float32))
    outs = {}
    for norm in ("mean", "sym"):
        m = get_model("gcn", 5, 8, 3, 1, norm=norm)
        params = m.init(jax.random.PRNGKey(0))
        outs[norm] = np.asarray(m.apply(params, batch, x0))
        assert np.isfinite(outs[norm]).all()
    assert not np.allclose(outs["mean"], outs["sym"])
