"""exp7 redundancy accounting: property checks on a tiny graph.

The experiment measures the flagship thesis (data-parallel chips duplicate
frontier work that split-parallelism computes once); these tests pin the
invariants the measured ratios rely on.
"""

import json
import os

import numpy as np
import pytest


@pytest.fixture
def exp7_record(tmp_path, monkeypatch):
    from benchmarks import experiments

    monkeypatch.setattr(experiments, "RESULTS_DIR", str(tmp_path))
    experiments.main([
        "exp7", "--num-nodes", "5000", "--avg-degree", "8",
        "--feature-dim", "16", "--fan-out", "5,5", "--batch-size", "256",
        "--num-hidden", "32", "--cache-per", "0.05", "--num-batches", "2",
    ])
    with open(os.path.join(tmp_path, "exp7.jsonl")) as fp:
        return json.loads(fp.readline())


def test_exp7_ratios_are_redundancy_factors(exp7_record):
    rows = exp7_record["rows"]
    assert [r["P"] for r in rows] == [2, 4, 8]
    for r in rows:
        c = r["counts_per_batch"]
        # P independent chips can only duplicate work, never shed it.
        assert r["edges_ratio"] >= 1.0
        assert r["hidden_rows_ratio"] >= 1.0
        assert r["feature_rows_ratio"] >= 1.0
        assert r["frontier_dup_factor"] >= 1.0
        # Duplication factor is sum/union of the chips' deepest frames.
        assert c["ddp_feat"] >= c["union_feat"]
        # Split slices ONE subgraph: its feature rows are a single frame.
        assert c["split_feat"] <= c["union_feat"] * 2
        # Boundary partials exist whenever P > 1 on a random partition.
        assert c["shuffle_rows"] > 0
        # Misses can never exceed the rows fetched.
        assert c["ddp_miss"] <= c["ddp_feat"]
        assert c["split_miss"] <= c["split_feat"]


def test_exp7_frontier_dup_grows_with_p(exp7_record):
    dup = [r["frontier_dup_factor"] for r in exp7_record["rows"]]
    assert dup[0] < dup[1] < dup[2]
