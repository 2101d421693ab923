"""video-restore-tpu: a TPU-native (JAX/XLA/Pallas) video restoration framework.

A from-scratch rebuild of the capability surface of ryanjcooper/video-restore
(reference: /root/reference/video_upscaler.py) designed TPU-first:

- Real-ESRGAN-family super-resolution models (RRDBNet x2/x4/anime-6B,
  SRVGGNetCompact) as pure-functional JAX models in NHWC bfloat16.
- A seamless tile engine that batches overlapping tiles through the model and
  Gaussian-blends them inside a single jitted computation (no per-tile host
  round-trips, unlike the reference's sequential RealESRGANer tile loop).
- An enhanced post-processing stack (bilateral denoise, CLAHE, unsharp mask,
  motion-adaptive temporal consistency) as vectorized JAX/Pallas kernels.
- Host-side video I/O (FFmpeg subprocess / OpenCV / pure-Python Y4M backends)
  with double-buffered async device feeding.
- Frame-sharded dispatch over a ``jax.sharding.Mesh`` replacing the
  reference's thread-per-GPU round-robin (video_upscaler.py:430-488).
"""

from video_restore_tpu.version import __version__

__all__ = ["__version__"]
