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
    """1-D mesh over which the frame batch axis is sharded.

    Under a multi-process runtime (jax.distributed initialized, e.g.
    --multihost batch mode) this is a mesh over the LOCAL devices only:
    batch mode shards *videos* across processes, so the per-video
    program must not span hosts — a global mesh would make each host's
    (different!) video a mismatched cross-host collective.
    """
    if devices is not None:
        devs = list(devices)
        n = len(devs)
    else:
        devs = (
            jax.local_devices()
            if jax.process_count() > 1
            else jax.devices()
        )
        n = len(devs) if n_devices <= 0 else n_devices
        if n > len(devs):
            raise RuntimeError(
                f"Requested {n} devices but only {len(devs)} available"
            )
    return Mesh(np.array(devs[:n]), axis_names=(data_axis,))
