"""Fine-tuning subsystem.

The reference ships no training code (SURVEY.md scope note) — inference
only. This module adds a TPU-native fine-tuning capability for the same
model family: Charbonnier/L1 pixel losses, PSNR/SSIM metrics, an optax
train step shardable over a (dp, tp) mesh, and a degrade-on-the-fly paired
patch sampler in the spirit of the Real-ESRGAN training recipe.
"""

from video_restore_tpu.training.losses import (
    charbonnier_loss,
    l1_loss,
    psnr,
    ssim,
)
from video_restore_tpu.training.train import (
    TrainState,
    make_train_step,
    shard_train_state,
    train_step_sharded,
)

__all__ = [
    "charbonnier_loss",
    "l1_loss",
    "psnr",
    "ssim",
    "TrainState",
    "make_train_step",
    "shard_train_state",
    "train_step_sharded",
]
