"""Torch ``.pth`` checkpoint -> JAX param-pytree conversion.

The released Real-ESRGAN checkpoints are torch state_dicts (OIHW conv
weights, sometimes nested under ``params_ema``/``params``). This module maps
them onto the pytrees produced by ``init_rrdbnet``/``init_srvgg``:

- conv weights: OIHW -> HWIO (transpose 2,3,1,0)
- the ``num_block`` body blocks are stacked along a leading axis (lax.scan
  layout)

torch (CPU) is imported lazily and needed only for this one-time conversion;
the runtime loads the converted ``.npz``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Union

import numpy as np


def _load_state_dict(path: Union[str, Path]) -> Dict[str, np.ndarray]:
    import os

    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:
        # weights_only=False executes arbitrary pickle code: only allow it
        # on explicit opt-in (a corrupt download or a hostile user-supplied
        # .pth must not silently escalate to code execution).
        if os.environ.get("VRT_UNSAFE_PICKLE") != "1":
            raise RuntimeError(
                f"safe (weights_only) load of {path} failed: {e}. If you "
                "trust this checkpoint, retry with VRT_UNSAFE_PICKLE=1."
            ) from e
        import logging

        logging.getLogger("video_restore_tpu").warning(
            "loading %s with weights_only=False (VRT_UNSAFE_PICKLE=1): "
            "pickle code in the file will execute", path,
        )
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("params_ema", "params", "state_dict"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    return {k: v.detach().cpu().numpy() for k, v in ckpt.items()}


def _conv(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    w = sd[f"{prefix}.weight"]  # OIHW
    b = sd.get(f"{prefix}.bias")
    out = {"w": np.transpose(w, (2, 3, 1, 0)).astype(np.float32)}
    out["b"] = (b if b is not None else np.zeros(w.shape[0])).astype(np.float32)
    return out


def convert_rrdbnet(
    sd: Dict[str, np.ndarray],
    num_block: int,
    key_style: str = "basicsr",
    num_upsample: int = 2,
) -> Dict[str, Any]:
    """``key_style``/``num_upsample`` select the checkpoint flavor: basicsr
    (Real-ESRGAN releases) vs original-ESRGAN/KAIR naming (BSRGAN; its x2
    variant has a single upsample stage and no conv_up2)."""
    from video_restore_tpu.models.manifests import RRDB_KEY_STYLES

    names = RRDB_KEY_STYLES[key_style]

    def rdb(i: int, j: int) -> Dict[str, Any]:
        return {
            f"conv{k}": _conv(sd, names["body"].format(i=i, j=j, k=k))
            for k in range(1, 6)
        }

    blocks = [{"rdb1": rdb(i, 1), "rdb2": rdb(i, 2), "rdb3": rdb(i, 3)} for i in range(num_block)]

    def stack(*leaves):
        return np.stack(leaves)

    import jax

    body = jax.tree.map(stack, *blocks)
    params = {
        "conv_first": _conv(sd, "conv_first"),
        "body": body,
        "conv_body": _conv(sd, names["conv_body"]),
        "conv_up1": _conv(sd, names["conv_up1"]),
        "conv_hr": _conv(sd, names["conv_hr"]),
        "conv_last": _conv(sd, "conv_last"),
    }
    if num_upsample == 2:
        params["conv_up2"] = _conv(sd, names["conv_up2"])
    return params


def convert_srvgg(sd: Dict[str, np.ndarray], num_conv: int) -> Dict[str, Any]:
    # torch module list: body.0 conv_in, body.1 prelu, then (conv, prelu)
    # pairs at (2+2i, 3+2i), final conv at 2+2*num_conv.
    import jax

    body = [
        {
            **_conv(sd, f"body.{2 + 2 * i}"),
            "alpha": sd[f"body.{3 + 2 * i}.weight"].astype(np.float32),
        }
        for i in range(num_conv)
    ]
    return {
        "conv_in": _conv(sd, "body.0"),
        "alpha_in": sd["body.1.weight"].astype(np.float32),
        "body": jax.tree.map(lambda *xs: np.stack(xs), *body),
        "conv_out": _conv(sd, f"body.{2 + 2 * num_conv}"),
    }


def convert_pth_to_params(path: Union[str, Path], model_name: str) -> Dict[str, Any]:
    from video_restore_tpu.models.manifests import validate_state_dict
    from video_restore_tpu.models.rrdbnet import RRDBNetSpec
    from video_restore_tpu.models.zoo import MODEL_ZOO

    spec = MODEL_ZOO[model_name].spec
    sd = _load_state_dict(path)
    # fail loudly (with a key diff) on any deviation from the released
    # checkpoint schema rather than producing a silently broken model
    validate_state_dict(sd, model_name)
    if isinstance(spec, RRDBNetSpec):
        return convert_rrdbnet(
            sd, spec.num_block, spec.key_style, spec.num_upsample
        )
    return convert_srvgg(sd, spec.num_conv)
