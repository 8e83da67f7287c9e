"""Test environment: force CPU with 8 virtual devices so sharding/pjit paths
are exercised without TPU hardware (SURVEY.md §4 'Distributed'). Must run
before jax is imported anywhere."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment may pin JAX_PLATFORMS to a hardware backend (e.g. a tunneled
# TPU) via sitecustomize BEFORE conftest runs; env vars alone don't win. Force
# the CPU backend through the config so tests are fast and run the virtual
# 8-device mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from gatv2_tpu.config import ModelConfig  # noqa: E402
from gatv2_tpu.data.synthetic import random_graph, chain_graph  # noqa: E402


@pytest.fixture
def tiny_graph():
    return random_graph(
        num_nodes=40, num_edges=160, feature_dim=12, num_classes=3, seed=7
    )


@pytest.fixture
def learnable_graph():
    return random_graph(
        num_nodes=200,
        num_edges=800,
        feature_dim=32,
        num_classes=4,
        seed=0,
        planted_signal=2.0,
    )


@pytest.fixture
def tiny_config(tiny_graph):
    return ModelConfig(
        num_layers=2,
        heads=(2, 1),
        out_dims=(8, 6),
        num_classes=tiny_graph.num_classes,
        in_dim=tiny_graph.feature_dim,
    )
