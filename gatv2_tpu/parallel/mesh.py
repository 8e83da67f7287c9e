"""Device mesh construction for single- and multi-host TPU slices."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    num_devices: int | None = None,
    axis_name: str = "graph",
    *,
    head_shards: int = 1,
    head_axis: str = "head",
) -> Mesh:
    """Mesh over the first `num_devices` devices (default: all).

    The 'graph' axis carries the edge/node partition (the SP/CP analog for
    GNNs, SURVEY.md §2.5); with head_shards > 1 a second 'head' axis carries
    tensor parallelism over attention heads. On a TPU slice JAX orders
    devices so neighboring mesh coordinates are ICI neighbors; the head axis
    is innermost (fastest-varying) so its collectives ride the shortest
    links.
    """
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, only {len(devices)} available"
            )
        devices = devices[:num_devices]
    if head_shards <= 1:
        return Mesh(np.asarray(devices), (axis_name,))
    if len(devices) % head_shards:
        raise ValueError(
            f"{len(devices)} devices not divisible by head_shards={head_shards}"
        )
    arr = np.asarray(devices).reshape(len(devices) // head_shards, head_shards)
    return Mesh(arr, (axis_name, head_axis))
