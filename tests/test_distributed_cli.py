"""Multi-host CLI: `--distributed` launches a jax.distributed cluster from
the trainer itself (VERDICT r2 item 5 — the multihost machinery previously
lived only in library tests). Two OS processes train split-parallel WITH an
active SplitFeatureCache (cache_pct < 1/P, so per-batch refresh tails are
gathered and uploaded PER HOST), and the result must match the
single-process run exactly."""

import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


COMMON = [
    "--graph", "community", "--num-nodes", "2000", "--avg-degree", "8",
    "--feature-dim", "16", "--fan-out", "3,3", "--batch-size", "128",
    "--num-epochs", "2", "--mode", "split", "--partitions", "4",
    "--cache-per", "0.1",  # < 1/P: per-batch refresh tails ACTIVE
    "--num-workers", "1", "--seed", "0", "--json",
]


def _last_json(out: str) -> dict:
    for line in reversed(out.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no JSON line in output:\n{out[-2000:]}")


def test_distributed_cli_matches_single_process():
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "occ_gnn_tpu.train", *COMMON,
             "--cpu", "--cpu-devices", "2", "--distributed",
             "--coordinator-address", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True, cwd=REPO,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0, out[-3000:]
        outs.append(out)
    m0, m1 = (_last_json(o) for o in outs)
    # Both processes see the same (psum'd) global metrics.
    assert m0["acc"] == m1["acc"]
    assert abs(m0["loss"] - m1["loss"]) < 1e-6
    assert m0["partitions"] == 4

    # And the 2-host run reproduces the single-process result: same seeded
    # sampling, same cache plan, same step math — only the work placement
    # (emit_range slicing + per-host cache tails) differs.
    from occ_gnn_tpu import train as trainer

    single = trainer.main(COMMON)
    assert single["acc"] == m0["acc"]
    assert abs(single["loss"] - m0["loss"]) < 1e-5
