"""Model forward parity vs torch golden + end-to-end training.

Pattern 1 of the reference test strategy (SURVEY.md §4): a torch golden
implementation computes the same layer math; our JAX models must match
allclose. Then end-to-end: training on a community graph must reach high
accuracy (the reference only ever eyeballed loss curves; we assert)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp
import optax

from occ_gnn_tpu.models import GATModel, GCNModel, SAGEModel, get_model
from occ_gnn_tpu.models.common import masked_cross_entropy
from occ_gnn_tpu.sampling.neighbor import NeighborSampler
from occ_gnn_tpu.training import gather_features, make_eval_step, make_train_step


def _torch_spmm_mean(x, src, dst, num_dst):
    E = src.shape[0]
    t_src = torch.tensor(src, dtype=torch.long)
    t_dst = torch.tensor(dst, dtype=torch.long)
    total = torch.zeros(num_dst, x.shape[1]).index_add_(0, t_dst, x[t_src])
    cnt = torch.zeros(num_dst).index_add_(0, t_dst, torch.ones(E))
    return total / cnt.clamp(min=1.0)[:, None]


def _valid_coo(block):
    ne = int(block.num_edges)
    return np.asarray(block.edge_src)[:ne], np.asarray(block.edge_dst)[:ne]


def test_sage_forward_matches_torch(small_graph):
    fanouts = [4, 3]
    sampler = NeighborSampler(small_graph, small_graph.train_nodes(),
                              fanouts, 24, seed=0)
    batch = next(iter(sampler))
    model = SAGEModel(small_graph.feature_dim, 8, small_graph.num_classes, 2)
    params = model.init(jax.random.PRNGKey(0))
    x0 = gather_features(small_graph.features, batch.input_nodes)
    logits = np.asarray(model.apply(params, batch, x0))

    # Torch golden forward on the same padded frames.
    x = torch.tensor(np.asarray(x0))
    for i, blk in enumerate(batch.blocks):
        src, dst = _valid_coo(blk)
        neigh = _torch_spmm_mean(x, src, dst, blk.dst_cap)
        self_x = x[: blk.dst_cap]
        p = params[f"layer_{i}"]
        w = torch.tensor(np.asarray(p["w"]))
        b = torch.tensor(np.asarray(p["b"]))
        x = torch.cat([self_x, neigh], dim=1) @ w + b
        if i != len(batch.blocks) - 1:
            x = torch.relu(x)
    n_t = int(batch.blocks[-1].num_dst)
    np.testing.assert_allclose(logits[:n_t], x.numpy()[:n_t], rtol=1e-4,
                               atol=1e-4)


def test_gcn_forward_matches_torch(small_graph):
    sampler = NeighborSampler(small_graph, small_graph.train_nodes(),
                              [3, 3], 16, seed=1)
    batch = next(iter(sampler))
    model = GCNModel(small_graph.feature_dim, 8, small_graph.num_classes, 2)
    params = model.init(jax.random.PRNGKey(1))
    x0 = gather_features(small_graph.features, batch.input_nodes)
    logits = np.asarray(model.apply(params, batch, x0))

    x = torch.tensor(np.asarray(x0))
    for i, blk in enumerate(batch.blocks):
        src, dst = _valid_coo(blk)
        neigh = _torch_spmm_mean(x, src, dst, blk.dst_cap)
        p = params[f"layer_{i}"]
        x = neigh @ torch.tensor(np.asarray(p["w"])) + torch.tensor(
            np.asarray(p["b"])
        )
        if i != len(batch.blocks) - 1:
            x = torch.relu(x)
    n_t = int(batch.blocks[-1].num_dst)
    np.testing.assert_allclose(logits[:n_t], x.numpy()[:n_t], rtol=1e-4,
                               atol=1e-4)


def test_gat_forward_matches_torch(small_graph):
    sampler = NeighborSampler(small_graph, small_graph.train_nodes(),
                              [3, 3], 16, seed=2)
    batch = next(iter(sampler))
    K, H = 2, 6
    model = GATModel(small_graph.feature_dim, H, small_graph.num_classes, 2,
                     num_heads=K)
    params = model.init(jax.random.PRNGKey(2))
    x0 = gather_features(small_graph.features, batch.input_nodes)
    logits = np.asarray(model.apply(params, batch, x0))

    x = torch.tensor(np.asarray(x0))
    n_layers = len(batch.blocks)
    for i, blk in enumerate(batch.blocks):
        src, dst = _valid_coo(blk)
        p = params[f"layer_{i}"]
        w = torch.tensor(np.asarray(p["w"]))
        al = torch.tensor(np.asarray(p["attn_l"]))
        ar = torch.tensor(np.asarray(p["attn_r"]))
        d_out = al.shape[1]
        feat = (x @ w).reshape(-1, K, d_out)
        el = torch.einsum("skd,kd->sk", feat, al)
        er = torch.einsum("skd,kd->sk", feat[: blk.dst_cap], ar)
        t_src = torch.tensor(src, dtype=torch.long)
        t_dst = torch.tensor(dst, dtype=torch.long)
        scores = torch.nn.functional.leaky_relu(el[t_src] + er[t_dst], 0.2)
        out = torch.zeros(blk.dst_cap, K, d_out)
        for s in range(int(blk.num_dst)):
            m = t_dst == s
            if m.any():
                alpha = torch.softmax(scores[m], dim=0)  # [e, K]
                out[s] = (feat[t_src[m]] * alpha[:, :, None]).sum(0)
        if i == n_layers - 1:
            x = out.mean(1)
        else:
            b = torch.tensor(np.asarray(p["b"]))
            x = out.reshape(-1, K * d_out) + b
            x = torch.nn.functional.elu(x)
    n_t = int(batch.blocks[-1].num_dst)
    np.testing.assert_allclose(logits[:n_t], x.numpy()[:n_t], rtol=1e-3,
                               atol=1e-3)


def test_sage_learns_community_graph(community_graph):
    g = community_graph
    model = SAGEModel(g.feature_dim, 32, g.num_classes, 2)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    step = make_train_step(model, opt)
    sampler = NeighborSampler(g, g.train_nodes(), [5, 5], 128, seed=0)
    rng = jax.random.PRNGKey(1)
    for epoch in range(5):
        correct = total = 0
        for batch in sampler:
            rng, sub = jax.random.split(rng)
            x0 = gather_features(g.features, batch.input_nodes)
            params, opt_state, loss, c, t = step(params, opt_state, batch,
                                                 x0, sub)
            correct += int(c)
            total += int(t)
    train_acc = correct / total
    assert train_acc > 0.9, f"train acc {train_acc}"

    # Eval on held-out nodes.
    ev = make_eval_step(model)
    val_sampler = NeighborSampler(g, np.nonzero(g.val_mask)[0], [5, 5], 128,
                                  seed=3)
    correct = total = 0
    for batch in val_sampler:
        x0 = gather_features(g.features, batch.input_nodes)
        _, c, t = ev(params, batch, x0)
        correct += int(c)
        total += int(t)
    assert correct / total > 0.85, f"val acc {correct / total}"


def test_model_factory():
    m = get_model("sage", 16, 8, 4, 2)
    assert isinstance(m, SAGEModel)
    m = get_model("gat", 16, 8, 4, 2, num_heads=2)
    assert isinstance(m, GATModel)
    m = get_model("gcn", 16, 8, 4, 2)
    assert isinstance(m, GCNModel)
