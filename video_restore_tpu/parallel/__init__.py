"""Parallel dispatch: frame sharding over a ``jax.sharding.Mesh``.

Replaces the reference's thread-per-GPU round-robin with its frame-drop race
(SURVEY.md §2.6 defect 1; /root/reference/video_upscaler.py:430-488): here a
single dispatcher feeds batches whose leading frame axis is sharded across
the mesh. Devices never communicate for the core pipeline (frames are
independent), so XLA inserts no collectives — the sharding only places
per-frame work on chips, the TPU analogue of the reference's
"one model replica per GPU" (video_upscaler.py:309-340).
"""

from video_restore_tpu.parallel.mesh import frame_mesh, device_count
from video_restore_tpu.parallel.dispatch import ShardedUpscaler

__all__ = ["frame_mesh", "device_count", "ShardedUpscaler"]
