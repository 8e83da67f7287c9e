#!/usr/bin/env python
"""Multi-host (multi-process) sharded-training smoke: one process per
"host", CPU backend, localhost coordinator — the standard JAX way to
exercise jax.distributed + cross-process collectives without a pod.

Each process builds the same deterministic graph, initializes the
distributed runtime through parallel.multihost.initialize(), constructs a
global 1-device-per-process mesh, and runs a few sharded training epochs.
The per-epoch losses are printed as JSON; they must agree across processes
(the loss is psum-replicated) and with a single-process run on the same
number of virtual devices (tests/test_multihost.py asserts both).

Usage (launched by the test, or by hand):
  python tools/multihost_smoke.py <process_id> <num_processes> <port>
"""

from __future__ import annotations

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    proc_id, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "step"
    os.environ["JAX_NUM_PROCESSES"] = str(nprocs)  # multihost detection
    import jax

    jax.config.update("jax_platforms", "cpu")

    from gatv2_tpu.parallel import multihost

    assert multihost.is_multihost_env()
    ok = multihost.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=proc_id,
    )
    assert ok, "multihost.initialize() did not trigger"
    print(multihost.process_summary(), file=sys.stderr)

    run = {
        "step": run_training,
        "trainer": run_trainer,
        "sell": run_training_sell,
    }[mode]
    losses = run(num_devices=jax.device_count())
    print(json.dumps({"process": proc_id, "losses": losses}), flush=True)
    return 0


def run_trainer(num_devices: int, epochs: int = 4) -> list[float]:
    """The full ShardedTrainer class (splits, masked labels, per-epoch
    split eval, broadcast default seed, multi-host-safe placements) —
    everything `--mesh --split-*` reaches from the CLI."""
    from gatv2_tpu.config import ModelConfig, TrainConfig
    from gatv2_tpu.data.splits import random_splits
    from gatv2_tpu.data.synthetic import random_graph
    from gatv2_tpu.parallel.sharded import ShardedTrainer

    g = random_graph(256, 2048, 16, 4, seed=11)
    mc = ModelConfig(
        num_layers=2, heads=(2, 2), out_dims=(8, 6),
        num_classes=g.num_classes, in_dim=g.feature_dim,
    )
    # seed=None exercises the time-based default + process-0 broadcast
    tc = TrainConfig(optimizer="adam", lr=0.02, seed=None, epochs=0)
    sp = random_splits(g.num_nodes, (0.6, 0.2, 0.2), seed=3)
    tr = ShardedTrainer(
        g, mc, tc, num_devices, log_fn=lambda s: None, splits=sp
    )
    losses = []
    for _ in range(epochs):
        last = tr.run(1)
        losses.append(
            [last["loss"], last["train_accuracy"], last["val_accuracy"],
             last["test_accuracy"]]
        )
    return losses


def run_training_sell(num_devices: int, epochs: int = 4) -> list[float]:
    """run_training on the SELL kernels: per-shard bipartite SELL layouts
    inside the 2-process mesh (interpret mode on CPU)."""
    return run_training(num_devices, epochs, impl="sell")


def run_training(
    num_devices: int, epochs: int = 4, impl: str = "xla"
) -> list[float]:
    """Deterministic sharded training; shared by the smoke processes and the
    single-process comparison run in tests/test_multihost.py."""
    import jax
    import jax.numpy as jnp

    from gatv2_tpu.config import ModelConfig, TrainConfig
    from gatv2_tpu.data.synthetic import random_graph
    from gatv2_tpu.models import gatv2
    from gatv2_tpu.parallel.mesh import make_mesh
    from gatv2_tpu.parallel.partition import partition_graph
    from gatv2_tpu.parallel.sharded import (
        device_put_params,
        device_put_partitioned,
        make_sharded_train_step,
    )
    from gatv2_tpu.train import optim

    g = random_graph(256, 2048, 16, 4, seed=11)
    mc = ModelConfig(
        num_layers=2, heads=(2, 2), out_dims=(8, 6),
        num_classes=g.num_classes, in_dim=g.feature_dim,
    )
    tc = TrainConfig(optimizer="adam", lr=0.02, seed=0, impl=impl)
    mesh = make_mesh(num_devices)
    pg = partition_graph(g, num_devices)
    tiles = None
    if impl == "sell":
        from gatv2_tpu.parallel.partition import (
            prepare_partitioned_sell_tiles,
        )

        tiles = prepare_partitioned_sell_tiles(pg)
    data = device_put_partitioned(pg, mesh)
    params = device_put_params(
        gatv2.init_params_for_variant(mc, jax.random.PRNGKey(0)), mc, mesh
    )
    opt_state = optim.init_opt_state(params, "adam")
    step = make_sharded_train_step(
        mc, tc, mesh, pg.num_real_nodes, edge_tiles=tiles,
        interpret=jax.default_backend() == "cpu",
    )
    losses = []
    for epoch in range(1, epochs + 1):
        params, opt_state, loss, acc = step(
            params, opt_state, jnp.asarray(epoch, jnp.int32), *data
        )
        losses.append(float(loss))
    return losses


if __name__ == "__main__":
    sys.exit(main())
