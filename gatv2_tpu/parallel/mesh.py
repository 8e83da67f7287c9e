"""Device mesh construction for single- and multi-host TPU slices."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    num_devices: int | None = None, axis_name: str = "graph"
) -> Mesh:
    """1-D mesh over the first `num_devices` devices (default: all).

    The 'graph' axis carries the edge/node partition (the SP/CP analog for
    GNNs, SURVEY.md §2.5); on a TPU slice JAX orders devices so neighboring
    mesh coordinates are ICI neighbors.
    """
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, only {len(devices)} available"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))
