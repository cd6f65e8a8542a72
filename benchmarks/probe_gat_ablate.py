"""On-chip phase attribution for the products-scale GAT step.

The products GAT record (bench_tpu.jsonl, 83.7 ms) is 2.34x the SAGE
step at the same scale, and switching the gathered-leaf residual
``xg[K_cap, D_cap, H_in]`` from f32 to bf16 did not change the time —
so the gap is NOT residual streaming. This probe pins where it goes by
DIFFERENCING jitted variants over the SAME staged products-scale
batches (the method of probe_step_ablate.py):

  full         production GAT train step (fwd + bwd + adam)
  grad         forward + backward only
  fwd          forward + loss only
  fwd_uniform  attention-score chain ablated: pw := valid-mask (uniform
               weights; no wl/er contraction, no leaky_relu/softmax) —
               the gather, the weighted-sum einsum, the per-head
               projection, and all shapes stay identical
  fwd_sum      attention replaced by a SAGE-style plain fanout-K
               accumulate followed by one per-head projection — ablates
               the [K,D,heads]x[K,D,H] weighted einsum itself

  fwd - fwd_uniform   = cost of computing attention scores
  fwd_uniform - fwd_sum = cost of the weighted-sum einsum form
  fwd_sum              ~ SAGE-forward-shaped floor (gathers + matmuls)

Config mirrors bench.py's OCC_BENCH_MODEL=gat exactly (same graph seed,
measured capacities, bf16 storage, hidden 32 x 4 heads). Writes one
record to benchmarks/results/gat_phases.jsonl.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax

    if os.environ.get("OCC_PROBE_CPU"):  # smoke-test off the tunnel
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from occ_gnn_tpu.cache import CachePlan, SplitFeatureCache
    from occ_gnn_tpu.data import random_graph
    from occ_gnn_tpu.parallel.model import (
        SplitGAT,
        _local_ce,
        make_split_forward,
        make_split_train_step,
    )
    from occ_gnn_tpu.parallel.split import make_mesh
    from occ_gnn_tpu.sampling.native import NativeSplitSampler
    from occ_gnn_tpu.sampling.slicer import (
        measure_split_capacities,
        plan_split_capacities,
    )

    dtype = jnp.bfloat16
    P = 1
    num_nodes = int(os.environ.get("OCC_BENCH_NODES", 2_450_000))
    avg_degree = int(os.environ.get("OCC_BENCH_DEGREE", 25))
    g = random_graph(num_nodes=num_nodes, avg_degree=avg_degree,
                     feature_dim=100, num_classes=47, seed=0)
    g = g.pad_feature_dim(128)
    pmap = np.zeros(g.num_nodes, dtype=np.int32)
    fanouts = [10, 10, 25]
    batch_size = 1024
    cache_pct = 0.25

    safe = plan_split_capacities(batch_size, fanouts, g.num_nodes, P)
    probe = CachePlan(g, pmap, P, cache_pct,
                      refresh_cap=safe["frame_caps"][0])
    margin = float(os.environ.get("OCC_BENCH_MARGIN", 1.5))
    caps = measure_split_capacities(
        g, g.train_nodes(), pmap, P, fanouts, batch_size, num_batches=3,
        margin=margin, seed=1, cache_plan=probe,
    )
    plan = CachePlan(g, pmap, P, cache_pct,
                     refresh_cap=max(caps.pop("refresh_cap", 8), 8))
    cache = SplitFeatureCache(plan, dtype=dtype)
    sampler = NativeSplitSampler(
        g, g.train_nodes(), pmap, P, fanouts, batch_size,
        capacities=caps, seed=0, cache=cache, num_workers=1,
        drop_last=True,
    )

    mesh = make_mesh(P)
    heads, d_out_hidden = 4, 32
    model = SplitGAT(g.feature_dim, d_out_hidden, g.num_classes, 3,
                     num_heads=heads, dtype=dtype)

    def finish(lyr, v_loc, s_loc, k, d_out, is_last, p):
        own = jnp.maximum(lyr.owned_idx, 0)
        s_own = jnp.maximum(s_loc[own], 1e-16)
        out = v_loc[own] / s_own[..., None]
        out = out * lyr.owned_mask[:, None, None]
        if is_last:
            return out.mean(axis=1)
        return (out.reshape(-1, k * d_out) + p["b"]) * lyr.owned_mask[:, None]

    class UniformGAT(SplitGAT):
        """Scores ablated: pw is the valid mask (uniform attention).
        Gather, weighted-sum einsum, projection, shapes unchanged."""

        def layer(self, p, lyr, x, is_last):
            k = self.num_heads
            d_out = p["attn_l"].shape[1]
            w3 = p["w"].reshape(x.shape[-1], k, d_out)
            nbr = lyr.nbr_idx
            sentinel = x.shape[0] - 1
            xg = x[nbr]                                  # [K, D, H]
            valid = (nbr != sentinel)[..., None]
            pw = jnp.broadcast_to(
                valid.astype(x.dtype), (*nbr.shape, k)
            )                                            # [K, D, heads]
            s_loc = jnp.sum(pw.astype(jnp.float32), axis=0)
            agg = jnp.einsum("kdc,kdh->dch", pw, xg,
                             preferred_element_type=jnp.float32)
            v_loc = jnp.einsum("dch,hco->dco", agg, w3)
            return finish(lyr, v_loc, s_loc, k, d_out, is_last, p)

    class SumGAT(SplitGAT):
        """Weighted einsum ablated too: plain SAGE-style fanout-K
        accumulate, then one per-head projection of the sums."""

        def layer(self, p, lyr, x, is_last):
            k = self.num_heads
            d_out = p["attn_l"].shape[1]
            w3 = p["w"].reshape(x.shape[-1], k, d_out)
            nbr = lyr.nbr_idx
            sentinel = x.shape[0] - 1
            acc = x[nbr[0]].astype(jnp.float32)
            for kk in range(1, nbr.shape[0]):
                acc = acc + x[nbr[kk]].astype(jnp.float32)
            deg = jnp.sum((nbr != sentinel).astype(jnp.float32), axis=0)
            v_loc = jnp.einsum("dh,hco->dco", acc, w3)   # [D, heads, out]
            s_loc = jnp.broadcast_to(deg[:, None], (deg.shape[0], k))
            return finish(lyr, v_loc, s_loc, k, d_out, is_last, p)

    # ---- round-5 backward itemization (VERDICT r4 item 5): difference
    # the 23.7 ms backward the way r4 differenced the forward. Each
    # variant surgically removes one backward path from the REAL batched
    # attention (model.py SplitGAT.layer) while keeping the forward
    # byte-identical in structure:
    #   StopScoresGAT  pw := stop_gradient(pw) — ablates the score-chain
    #                  vjp (wl einsum transpose + leaky/exp/max chain +
    #                  er_frame scatter transpose)
    #   StopXgGAT      xg := stop_gradient(x[nbr]) — ablates the
    #                  neighbor-feature path (xg-side einsum vjps and the
    #                  gather-transpose scatters of layers >= 1; layer 0's
    #                  x is the non-differentiated cache frame already)
    #   RematGAT       jax.checkpoint(nothing_saveable) around the
    #                  attention block — backward RECOMPUTES the gather +
    #                  einsums instead of reading stored residuals
    #                  (store-vs-recompute trade, shippable if it wins)

    def batched_attention(p, lyr, x, is_last, k, d_out, neg, pw_stop=False,
                          xg_stop=False):
        dst_cap = lyr.dst_cap
        w3 = p["w"].reshape(x.shape[-1], k, d_out)
        wl = jnp.einsum("hkd,kd->hk", w3, p["attn_l"])
        wr = jnp.einsum("hkd,kd->hk", w3, p["attn_r"])
        x_self = x[lyr.self_idx].astype(jnp.float32)
        er_own = (x_self @ wr) * lyr.owned_mask[:, None]
        er_frame = jnp.zeros((dst_cap, k), er_own.dtype)
        tgt = jnp.where(lyr.owned_idx < 0, dst_cap, lyr.owned_idx)
        er_frame = er_frame.at[tgt].set(er_own, mode="drop")
        nbr = lyr.nbr_idx
        sentinel = x.shape[0] - 1
        xg = x[nbr]
        if xg_stop:
            xg = jax.lax.stop_gradient(xg)
        valid = (nbr != sentinel)[..., None]
        z = jax.nn.leaky_relu(
            jnp.einsum("kdh,hc->kdc", xg, wl.astype(x.dtype),
                       preferred_element_type=jnp.float32)
            + er_frame[None], neg,
        )
        z = jnp.where(valid, z, -jnp.inf)
        m_loc = jnp.max(z, axis=0)
        safe = jnp.where(jnp.isfinite(m_loc), m_loc, 0.0)
        pw = jnp.where(valid, jnp.exp(z - safe[None]), 0.0)
        if pw_stop:
            pw = jax.lax.stop_gradient(pw)
        s_loc = jnp.sum(pw, axis=0)
        agg = jnp.einsum("kdc,kdh->dch", pw.astype(x.dtype), xg,
                         preferred_element_type=jnp.float32)
        v_loc = jnp.einsum("dch,hco->dco", agg, w3)
        return finish(lyr, v_loc, s_loc, k, d_out, is_last, p)

    def make_variant(pw_stop=False, xg_stop=False, remat=False):
        class Variant(SplitGAT):
            def layer(self, p, lyr, x, is_last):
                fn = lambda p_, x_: batched_attention(
                    p_, lyr, x_, is_last, self.num_heads,
                    p["attn_l"].shape[1], self.negative_slope,
                    pw_stop=pw_stop, xg_stop=xg_stop,
                )
                if remat:
                    fn = jax.checkpoint(
                        fn,
                        policy=jax.checkpoint_policies.nothing_saveable,
                    )
                return fn(p, x)

        return Variant(g.feature_dim, d_out_hidden, g.num_classes, 3,
                       num_heads=heads, dtype=dtype)

    base_v = make_variant()
    stop_scores = make_variant(pw_stop=True)
    stop_xg = make_variant(xg_stop=True)
    remat_v = make_variant(remat=True)

    uniform = UniformGAT(g.feature_dim, d_out_hidden, g.num_classes, 3,
                         num_heads=heads, dtype=dtype)
    plain = SumGAT(g.feature_dim, d_out_hidden, g.num_classes, 3,
                   num_heads=heads, dtype=dtype)

    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_split_train_step(model, opt, mesh)

    def make_fwd_loss(m):
        fwd = make_split_forward(m, mesh)

        @jax.jit
        def fwd_loss(params, batch, frames):
            logits = fwd(params, batch, frames)
            nll, cnt, _ = _local_ce(
                logits.reshape(-1, logits.shape[-1]),
                batch.labels.reshape(-1),
            )
            return nll / jnp.maximum(cnt, 1)

        return fwd_loss

    fwd_loss = make_fwd_loss(model)
    fwd_uniform = make_fwd_loss(uniform)
    fwd_sum = make_fwd_loss(plain)
    grad_fn = jax.jit(jax.grad(fwd_loss))
    grad_base = jax.jit(jax.grad(make_fwd_loss(base_v)))
    grad_stop_scores = jax.jit(jax.grad(make_fwd_loss(stop_scores)))
    grad_stop_xg = jax.jit(jax.grad(make_fwd_loss(stop_xg)))
    grad_remat = jax.jit(jax.grad(make_fwd_loss(remat_v)))

    it = iter(sampler)
    nstage = int(os.environ.get("OCC_BENCH_NSTAGE", 8))
    staged = [next(it) for _ in range(nstage)]
    frames = cache.frames
    sampler.close()

    def timeit(name, fn):
        out = fn(staged[0])
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(leaf.reshape(-1)[0])  # tunnel-safe sync
        t0 = time.perf_counter()
        for b in staged:
            out = fn(b)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(leaf.reshape(-1)[0])
        dt = (time.perf_counter() - t0) / len(staged) * 1e3
        print(f"{name:12s} {dt:8.2f} ms", flush=True)
        return dt

    t_full = timeit("full", lambda b: step(params, opt_state, b, frames)[2])
    t_grad = timeit("grad", lambda b: grad_fn(params, b, frames))
    t_fwd = timeit("fwd", lambda b: fwd_loss(params, b, frames))
    t_uni = timeit("fwd_uniform", lambda b: fwd_uniform(params, b, frames))
    t_sum = timeit("fwd_sum", lambda b: fwd_sum(params, b, frames))
    t_gbase = timeit("grad_base", lambda b: grad_base(params, b, frames))
    t_gss = timeit("grad_stop_scores",
                   lambda b: grad_stop_scores(params, b, frames))
    t_gsx = timeit("grad_stop_xg",
                   lambda b: grad_stop_xg(params, b, frames))
    t_grm = timeit("grad_remat", lambda b: grad_remat(params, b, frames))

    rec = {
        "experiment": "gat_phases",
        "time": time.time(),
        "platform": jax.devices()[0].platform,
        "config": {"num_nodes": num_nodes, "avg_degree": avg_degree,
                   "fanouts": fanouts, "batch_size": batch_size,
                   "heads": heads, "d_out": d_out_hidden,
                   "dtype": "bfloat16", "nstage": nstage},
        "full_ms": round(t_full, 2), "grad_ms": round(t_grad, 2),
        "fwd_ms": round(t_fwd, 2),
        "fwd_uniform_ms": round(t_uni, 2),
        "fwd_sum_ms": round(t_sum, 2),
        "score_chain_ms": round(t_fwd - t_uni, 2),
        "weighted_einsum_ms": round(t_uni - t_sum, 2),
        "bwd_ms": round(t_grad - t_fwd, 2),
        "bwd_itemization_ms": {
            "grad_base_twin": round(t_gbase, 2),
            "grad_stop_scores": round(t_gss, 2),
            "grad_stop_xg": round(t_gsx, 2),
            "grad_remat_nothing_saveable": round(t_grm, 2),
            "score_chain_bwd": round(t_gbase - t_gss, 2),
            "neighbor_path_bwd": round(t_gbase - t_gsx, 2),
            "remat_delta": round(t_grm - t_gbase, 2),
        },
        "note": (
            "differencing attribution of the products GAT step: "
            "score_chain = fwd - fwd_uniform (wl/er contraction + "
            "leaky_relu/softmax over [K,D,heads]); weighted_einsum = "
            "fwd_uniform - fwd_sum (the kdc,kdh->dch weighted sum vs "
            "plain fanout-K adds); fwd_sum is the SAGE-shaped floor "
            "(gathers + per-head projection)"
        ),
    }
    out = os.path.join(os.path.dirname(__file__), "results",
                       "gat_phases.jsonl")
    with open(out, "a") as fp:
        fp.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
