"""Device mesh construction."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def device_count(requested: int = 0) -> int:
    """Number of devices to use (0 = all), like the reference's default
    gpu_ids = all CUDA devices (video_upscaler.py:137-139)."""
    n = len(jax.devices())
    if requested <= 0:
        return n
    if requested > n:
        raise RuntimeError(
            f"Requested {requested} devices but only {n} available"
        )
    return requested


def frame_mesh(
    n_devices: int = 0,
    *,
    data_axis: str = "data",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D mesh over which the frame batch axis is sharded."""
    devs = list(devices) if devices is not None else jax.devices()
    n = device_count(n_devices) if devices is None else len(devs)
    return Mesh(np.array(devs[:n]), axis_names=(data_axis,))
