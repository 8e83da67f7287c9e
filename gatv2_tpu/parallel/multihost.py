"""Multi-host initialization helpers.

The reference has no distributed communication at all (no NCCL/MPI/Gloo
anywhere, SURVEY.md §2.5). On TPU pods, JAX handles transport; the only
host-side requirement is calling jax.distributed.initialize() in every
process before touching devices. This module wraps that with the standard
TPU environment conventions, so multi-host training is:

    from gatv2_tpu.parallel import multihost
    multihost.initialize()          # no-op on single-host
    mesh = make_mesh()              # all devices across all hosts
    ...ShardedTrainer / make_sharded_train_step as usual

Sharded training composes: partition_graph over the global device count,
each host feeds its processes' shards (jax.device_put with a NamedSharding
addresses only local devices; use jax.make_array_from_process_local_data
for host-sharded inputs at pod scale).
"""

from __future__ import annotations

import os

import jax


def is_multihost_env() -> bool:
    """True when launched under a multi-host TPU runtime (GKE/ray/mpi style
    env conventions JAX understands)."""
    # NOTE: TPU_WORKER_HOSTNAMES is deliberately NOT trusted — single-chip
    # tunneled environments set it to a warning string.
    return any(
        os.environ.get(k)
        for k in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
    ) or os.environ.get("JAX_NUM_PROCESSES", "1") not in ("", "1")


def initialize(**kwargs) -> bool:
    """jax.distributed.initialize() when a multi-host environment is
    detected (auto-detects coordinator/process ids from the environment on
    TPU pods). Returns True if distributed mode was initialized."""
    if not is_multihost_env():
        return False
    jax.distributed.initialize(**kwargs)
    return True


def process_summary() -> str:
    return (
        f"process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local / {jax.device_count()} global devices"
    )
