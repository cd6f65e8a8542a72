"""Paired-row gather probe: can two bf16[128] feature rows ride one HBM
transaction?

The gather-locality study (benchmarks/results/gather_align.jsonl) showed
per-row gather cost is ~8 ns for any row <= 512 B (bf16[128] == f32[128]
wall time) and doubles at 1 KB rows — i.e. the dense fanout-K aggregation
pays one 512 B transaction per gathered row but only uses 256 B of it when
features are stored bf16[128]. If a gather of bf16[256] rows (two logical
rows packed, = exactly one 512 B transaction) costs the same ~8 ns per
SLOT, then pairing adjacent frame rows halves the transaction count for
every slot the slicer manages to pair.

This probe measures, at production-like shapes (S=1.6M frame rows,
K=26 x D=126k slots):
  1. baseline: K gathers of bf16[128] rows (the current dense-agg form)
  2. paired:   K/2 gathers of bf16[256] rows from the reshaped frame,
               each slot contributing BOTH halves with f32 weights
               (the aggregation form pairing would use)
  3. pad-cost: K gathers of bf16[128] where all indices hit row 0 —
               whether padded slots are free or full-price (decides if a
               Kp_cap capacity with padding can ever win)

    python benchmarks/probe_pair_gather.py        # real TPU
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.microbench import _timeit  # elision-proof TPU timing


def main():
    import jax
    import jax.numpy as jnp

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    S, D, K = 1_600_000, 126_000, 26
    H = 128
    x = jnp.asarray(
        rng.standard_normal((S, H)).astype(np.float32)
    ).astype(jnp.bfloat16)
    # blocky locality like the production frame (4k-window neighborhoods)
    base = rng.integers(0, S - 4096, D)
    nbr = ((base[None, :] + rng.integers(0, 4096, (K, D))) % S).astype(
        np.int32
    )
    nbrj = jnp.asarray(nbr)

    rows = []

    def rec(kind, t, slots):
        r = {"kind": kind, "ms": round(t * 1e3, 2),
             "ns_per_slot": round(t / slots * 1e9, 2)}
        rows.append(r)
        print(json.dumps(r), flush=True)

    # 1. baseline: current dense-agg form
    @jax.jit
    def agg_base(x, nbr):
        acc = x[nbr[0]].astype(jnp.float32)
        for k in range(1, K):
            acc = acc + x[nbr[k]].astype(jnp.float32)
        return acc

    rec("base_K26_bf16x128", _timeit(agg_base, x, nbrj, reps=5), K * D)

    # 2. paired: K/2 gathers of 256-lane rows, both halves weighted in.
    x2 = x.reshape(S // 2, 2 * H)
    Kp = K // 2
    pair_idx = jnp.asarray((nbr[:Kp] // 2).astype(np.int32))
    w_lo = jnp.asarray(rng.random((Kp, D), dtype=np.float32))
    w_hi = jnp.asarray(rng.random((Kp, D), dtype=np.float32))

    @jax.jit
    def agg_pair(x2, pidx, w_lo, w_hi):
        g = x2[pidx[0]].astype(jnp.float32)
        acc = g[:, :H] * w_lo[0][:, None] + g[:, H:] * w_hi[0][:, None]
        for k in range(1, Kp):
            g = x2[pidx[k]].astype(jnp.float32)
            acc = acc + g[:, :H] * w_lo[k][:, None]
            acc = acc + g[:, H:] * w_hi[k][:, None]
        return acc

    rec("pair_K13_bf16x256", _timeit(agg_pair, x2, pair_idx, w_lo, w_hi,
                                     reps=5), Kp * D)

    # 2b. pure gather rates at equal slot count (no weighting arithmetic),
    # to separate transaction cost from the VPU cost of the weighted form.
    idx_flat = jnp.asarray(nbr[:Kp].reshape(-1))

    @jax.jit
    def gsum128(x, idx):
        return x[idx].astype(jnp.float32).sum(axis=0)

    rec("gather128_13MD_slots", _timeit(gsum128, x, idx_flat, reps=5),
        Kp * D)

    pidx_flat = jnp.asarray((nbr[:Kp].reshape(-1) // 2).astype(np.int32))

    @jax.jit
    def gsum256(x2, idx):
        return x2[idx].astype(jnp.float32).sum(axis=0)

    rec("gather256_13MD_slots", _timeit(gsum256, x2, pidx_flat, reps=5),
        Kp * D)

    # 3. pad-cost: all slots hit row 0
    zeros = jnp.zeros_like(nbrj)
    rec("allzero_K26_bf16x128", _timeit(agg_base, x, zeros, reps=5), K * D)

    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/pair_gather.jsonl", "a") as f:
        f.write(json.dumps({
            "experiment": "pair_gather",
            "chip": str(jax.devices()[0].device_kind
                        if hasattr(jax.devices()[0], "device_kind")
                        else jax.devices()[0]),
            "shapes": f"S={S} x bf16[{H}], K={K}, D={D}",
            "rows": rows,
        }) + "\n")


if __name__ == "__main__":
    main()
