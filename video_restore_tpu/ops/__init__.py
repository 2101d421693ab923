"""Numeric core: pure JAX/Pallas ops (NHWC, TPU-friendly layouts).

Replaces the reference's native substrate (SURVEY.md §2.3): cuDNN convs via
torch -> XLA/MXU convs here; OpenCV bilateralFilter/CLAHE -> vectorized JAX
and Pallas kernels here.
"""

from video_restore_tpu.ops.conv import (
    conv2d,
    leaky_relu,
    prelu,
    pixel_shuffle,
    pixel_unshuffle,
    upsample_nearest,
)
from video_restore_tpu.ops.tiles import TileGrid, tiled_apply
from video_restore_tpu.ops.post import (
    bilateral_filter,
    clahe,
    unsharp_mask,
    temporal_blend,
)

__all__ = [
    "conv2d",
    "leaky_relu",
    "prelu",
    "pixel_shuffle",
    "pixel_unshuffle",
    "upsample_nearest",
    "TileGrid",
    "tiled_apply",
    "bilateral_filter",
    "clahe",
    "unsharp_mask",
    "temporal_blend",
]
