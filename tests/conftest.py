"""Test config: run all tests on a virtual 8-device CPU mesh.

The reference had no test framework at all (SURVEY.md §4); multi-chip
correctness here is validated without hardware via
``--xla_force_host_platform_device_count`` (which the reference never had).
"""

import os

# Must be set before jax is imported anywhere. Force CPU: tests must be
# hermetic and run with full f32 matmul precision (TPU would use bf16).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The hosting environment may pin JAX_PLATFORMS to a TPU plugin before this
# file runs; the config update wins over the env var.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def small_graph():
    from occ_gnn_tpu.data import random_graph

    return random_graph(num_nodes=500, avg_degree=6, feature_dim=16,
                        num_classes=5, seed=1)


@pytest.fixture(scope="session")
def community_graph():
    from occ_gnn_tpu.data import block_graph

    return block_graph(num_nodes=800, num_blocks=4, avg_degree=10,
                       cross_fraction=0.05, feature_dim=16, seed=2)
