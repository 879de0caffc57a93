"""Device mesh helpers."""
from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh


def make_mesh(
    num_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
) -> Mesh:
    """1-D mesh over the first ``num_devices`` visible devices.

    On a v5e-8 slice this is the 8-chip ICI ring; gradient psums ride
    ICI (never DCN at this scale).  With virtual CPU devices
    (``xla_force_host_platform_device_count``) the same code paths run
    in tests without hardware.
    """
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, only {len(devices)} visible"
            )
        devices = devices[:num_devices]
    import numpy as np

    return Mesh(np.asarray(devices), axis_names)
