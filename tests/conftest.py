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


# ---------------------------------------------------------------------------
# fast tier: `pytest -m fast` — a <60s (1-CPU host) smoke gate covering every
# subsystem: ops (segment + pallas interpret), model parity, training, CLI
# validation, sharding/partition logic, sampling, IO, checkpointing. The
# full suite (~12 min serial) stays the merge gate; this is the red/green
# loop. Curated centrally here so test files stay unannotated (except
# tests added with an explicit @pytest.mark.fast).
# ---------------------------------------------------------------------------

_FAST_TESTS = {
    "test_segment_ops.py": None,  # whole file
    "test_params_io.py": None,
    "test_io.py": None,
    "test_utils.py": None,
    "test_cli.py": "ALL_BUT_PIPELINE",  # predict_pipeline trains twice (~17s)
    "test_checkpoint.py": {
        "test_latest_of_multiple",
        "test_restore_with_empty_opt_template",
    },
    "test_pallas_attention.py": {
        "test_prepare_edge_tiles_layout",
        "test_src_sorted_tiling_layout",
        "test_pallas_matches_xla[1-8]",
        "test_pallas_grads_match_xla[pallas]",
    },
    "test_model_parity.py": {
        # edge-variant oracle runs in the full suite only (~10s); the node
        # variant exercises the same shared kernels + last-layer ordering
        "test_logits_match_oracle[node]",
        "test_zero_degree_nodes_get_zero_output",
    },
    "test_train.py": {
        "test_sgd_training_decreases_loss",
        "test_adam_epoch_indexed_bias_correction",
        "test_clip_by_group_norm_scales_to_threshold",
    },
    "test_grad.py": {"test_softmax_jacobian_identity"},
    "test_sharding.py": {
        "test_partition_covers_all_edges[edges]",
        "test_halo_plan_excludes_diagonal_on_community_graph",
        "test_edge_balanced_partition_on_powerlaw",
        "test_sharded_loss_matches_single_device[8]",
    },
    "test_sampling.py": {
        "test_sampler_shapes_and_validity[python]",
        "test_budget_modes",
    },
    "test_minibatch_sell.py": {"test_sell_geometry_bounds_hub_batch"},
    "test_sweep_tools.py": None,  # whole file (~1s, no jax compile)
    "test_sell.py": {"test_sell_f32_streams_unchanged"},
    "test_splits.py": {"test_trainer_split_evaluation"},
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = item.fspath.basename
        sel = _FAST_TESTS.get(fname)
        if sel is None and fname in _FAST_TESTS:
            item.add_marker(pytest.mark.fast)
        elif sel == "ALL_BUT_PIPELINE":
            if "pipeline" not in item.name:
                item.add_marker(pytest.mark.fast)
        elif isinstance(sel, set) and item.name in sel:
            item.add_marker(pytest.mark.fast)
