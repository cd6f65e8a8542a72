"""Multi-host slicing/caching scaling at scale — VERDICT r3 weak #6.

parallel/multihost.py claims per-host slicing work and cache state scale
~1/num_hosts (each host's C++ service emits only its partitions via
emit_range, and MultiHostFeatureCache builds static frames + refresh
tails only for local partitions). Round-3 proved bit-parity at toy
scale (2k nodes); this probe MEASURES the scaling claim at >=1M nodes
on the virtual CPU mesh:

  run A: single process, 8 devices, P=8 (full slicing + full cache)
  run B: two OS processes (jax.distributed), 4 devices each, P=8
         (each host slices/caches 4 partitions)

and records per-host cxx slice ms/batch, per-host peak RSS, and the
loss/accuracy parity of the runs (same seeded sampling -> identical
global batches). Expectation: B's per-host slice ms and RSS land well
below A's (the slice_layer emission loops and cache frames halve; the
sampling walk and global routing stay shared).

Run:  python -m benchmarks.probe_multihost_scale [--nodes 1000000]
Appends to benchmarks/results/multihost_scale.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(os.path.dirname(__file__), "results",
                       "multihost_scale.jsonl")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _last_json(out: str) -> dict:
    for line in reversed(out.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no JSON line in output:\n{out[-3000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--avg-degree", type=int, default=10)
    ap.add_argument("--fan-out", default="10,10")
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--limit-train", type=int, default=8192)
    ap.add_argument("--cache-per", default="0.1")
    args = ap.parse_args()

    common = [
        "--graph", "community", "--num-nodes", str(args.nodes),
        "--avg-degree", str(args.avg_degree), "--feature-dim", "64",
        "--fan-out", args.fan_out, "--batch-size", str(args.batch_size),
        "--num-epochs", "1", "--mode", "split", "--partitions", "8",
        "--cache-per", args.cache_per,  # < 1/P: refresh tails active
        "--num-workers", "1", "--seed", "0", "--json", "--measure-caps",
        "--limit-train", str(args.limit_train),
    ]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}

    def run_single():
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, "-m", "occ_gnn_tpu.train", *common,
             "--cpu", "--cpu-devices", "8"],
            capture_output=True, text=True, cwd=REPO, env=env,
            timeout=7200,
        )
        assert p.returncode == 0, p.stdout[-3000:] + p.stderr[-2000:]
        m = _last_json(p.stdout)
        m["wall_s"] = round(time.time() - t0, 1)
        return m

    def run_two_proc():
        port = str(_free_port())
        t0 = time.time()
        procs = [
            subprocess.Popen(
                [sys.executable, "-m", "occ_gnn_tpu.train", *common,
                 "--cpu", "--cpu-devices", "4", "--distributed",
                 "--coordinator-address", f"127.0.0.1:{port}",
                 "--num-processes", "2", "--process-id", str(i)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                env=env, text=True, cwd=REPO,
            )
            for i in range(2)
        ]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=7200)
            assert p.returncode == 0, out[-3000:]
            outs.append(_last_json(out))
        wall = round(time.time() - t0, 1)
        for o in outs:
            o["wall_s"] = wall
        return outs

    print("single-process run ...", flush=True)
    single = run_single()
    print(json.dumps(single), flush=True)
    print("2-process run ...", flush=True)
    h0, h1 = run_two_proc()
    print(json.dumps(h0), flush=True)
    print(json.dumps(h1), flush=True)

    slice_single = single["phases"].get("cxx_slice")
    slice_hosts = [h["phases"].get("cxx_slice") for h in (h0, h1)]
    rec = {
        "probe": "multihost_scale",
        "time": time.time(),
        "nodes": args.nodes,
        "config": common,
        "loss_parity": bool(
            abs(single["loss"] - h0["loss"]) < 1e-5
            and abs(h0["loss"] - h1["loss"]) < 1e-6
        ),
        "acc_parity": bool(single["acc"] == h0["acc"] == h1["acc"]),
        "cxx_slice_s_single": slice_single,
        "cxx_slice_s_per_host": slice_hosts,
        "slice_ratio_vs_single": [
            round(s / slice_single, 3) if slice_single else None
            for s in slice_hosts
        ],
        "peak_rss_mb_single": single.get("peak_rss_mb"),
        "peak_rss_mb_per_host": [h.get("peak_rss_mb") for h in (h0, h1)],
        "loss": {"single": single["loss"], "h0": h0["loss"],
                 "h1": h1["loss"]},
        "acc": {"single": single["acc"], "h0": h0["acc"]},
        "note": (
            "2-core harness: the two host processes time-share the cores, "
            "so WALL times are not comparable; the per-batch cxx_slice "
            "accumulators and per-process RSS are the scaling evidence. "
            "RSS includes the shared graph (~indptr+indices+features), "
            "which every host must hold; the deltas are cache frames + "
            "slicing arenas."
        ),
    }
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    with open(RESULTS, "a") as fp:
        fp.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
