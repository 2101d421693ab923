"""Model zoo: Real-ESRGAN-family architectures as pure-functional JAX models.

Replaces the reference's external basicsr/realesrgan dependency
(SURVEY.md §2.2): RRDBNet and SRVGGNetCompact are re-implemented from the
published architecture as param-pytree + apply functions in NHWC bf16, with a
torch ``.pth`` -> pytree weight converter for the released checkpoints.
"""

from video_restore_tpu.models.rrdbnet import RRDBNetSpec, init_rrdbnet, apply_rrdbnet
from video_restore_tpu.models.srvgg import SRVGGSpec, init_srvgg, apply_srvgg
from video_restore_tpu.models.zoo import (
    MODEL_ZOO,
    ModelHandle,
    get_model,
    model_spec,
    random_model,
)

__all__ = [
    "RRDBNetSpec",
    "init_rrdbnet",
    "apply_rrdbnet",
    "SRVGGSpec",
    "init_srvgg",
    "apply_srvgg",
    "MODEL_ZOO",
    "ModelHandle",
    "get_model",
    "model_spec",
    "random_model",
]
