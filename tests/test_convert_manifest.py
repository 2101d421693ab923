"""Converter vs the released checkpoints' serialization schema.

The real .pth files are unreachable in this environment (zero egress), so
these tests pin the converter's key mapping against hardcoded manifests of
the released checkpoints (public serialization facts — see
models/manifests.py). A key-name or shape deviation in the converter now
fails here instead of only surfacing on a user's machine (round-1 review,
missing item #4).
"""

import numpy as np
import pytest
import torch

import jax

from video_restore_tpu.models import zoo
from video_restore_tpu.models.convert import convert_pth_to_params
from video_restore_tpu.models.manifests import (
    CHECKPOINT_NEST_KEY,
    state_dict_manifest,
    validate_state_dict,
)

ALL_MODELS = list(zoo.MODEL_ZOO)


def _synthetic_checkpoint(name, tmp_path, nest=None):
    """A .pth with exactly the released checkpoint's keys and shapes."""
    manifest = state_dict_manifest(name)
    rng = np.random.default_rng(0)
    sd = {
        k: torch.from_numpy(rng.normal(0, 0.02, shape).astype(np.float32))
        for k, shape in manifest.items()
    }
    if nest is None:
        nest = CHECKPOINT_NEST_KEY[name]
    ckpt = {nest: sd} if nest else sd
    path = tmp_path / f"{name}.pth"
    torch.save(ckpt, path)
    return path


@pytest.mark.parametrize("name", ALL_MODELS)
def test_convert_released_schema(name, tmp_path):
    """Converting a checkpoint with the released schema must yield exactly
    the architecture's param pytree (same treedef, same shapes)."""
    path = _synthetic_checkpoint(name, tmp_path)
    params = convert_pth_to_params(path, name)
    template = zoo._init(name, jax.random.PRNGKey(0))
    t_flat, t_def = jax.tree_util.tree_flatten_with_path(template)
    p_flat, p_def = jax.tree_util.tree_flatten_with_path(params)
    assert t_def == p_def
    for (kp_t, leaf_t), (kp_p, leaf_p) in zip(t_flat, p_flat):
        assert kp_t == kp_p
        assert tuple(leaf_t.shape) == tuple(np.shape(leaf_p)), (
            f"{jax.tree_util.keystr(kp_t)}"
        )


@pytest.mark.parametrize("nest", ["params_ema", "params", ""])
def test_convert_nesting_variants(nest, tmp_path):
    """All observed top-level nestings (params_ema / params / flat) load."""
    name = "RealESRGAN_x4plus_anime_6B"
    path = _synthetic_checkpoint(name, tmp_path, nest=nest)
    params = convert_pth_to_params(path, name)
    assert params["conv_first"]["w"].shape == (3, 3, 3, 64)


def test_manifest_counts():
    """Spot-check the manifests against known architecture arithmetic."""
    # x4plus: 23 blocks * 3 RDBs * 5 convs * 2 tensors + 6 head/tail convs * 2
    assert len(state_dict_manifest("RealESRGAN_x4plus")) == 23 * 3 * 5 * 2 + 12
    # v3: 2 + 1 + 32*(2+1) + 2 = 101
    assert len(state_dict_manifest("RealESRGAN_x4_v3")) == 101
    # x2plus stem sees pixel-unshuffled input (12 channels)
    assert state_dict_manifest("RealESRGAN_x2plus")["conv_first.weight"] == (
        64, 12, 3, 3,
    )
    assert state_dict_manifest("RealESRGAN_x4plus")["conv_first.weight"] == (
        64, 3, 3, 3,
    )
    # final SRVGG conv feeds the x4 pixel shuffle
    m = state_dict_manifest("RealESRGAN_x4_v3")
    assert m["body.66.weight"] == (48, 64, 3, 3)
    # BSRGAN uses the original-ESRGAN/KAIR naming; its x2 variant has a
    # raw 3-channel stem (no pixel-unshuffle) and no second upconv
    b4 = state_dict_manifest("BSRGAN")
    assert b4["RRDB_trunk.0.RDB1.conv1.weight"] == (32, 64, 3, 3)
    assert b4["trunk_conv.weight"] == (64, 64, 3, 3)
    assert "upconv2.weight" in b4 and "conv_up1.weight" not in b4
    assert len(b4) == 23 * 3 * 5 * 2 + 12
    b2 = state_dict_manifest("BSRGANx2")
    assert b2["conv_first.weight"] == (64, 3, 3, 3)
    assert "upconv2.weight" not in b2
    assert len(b2) == 23 * 3 * 5 * 2 + 10
    assert CHECKPOINT_NEST_KEY["BSRGAN"] == ""


def test_validate_rejects_deviations(tmp_path):
    name = "RealESRGAN_x4plus_anime_6B"
    manifest = state_dict_manifest(name)
    good = {k: np.zeros(s, np.float32) for k, s in manifest.items()}
    validate_state_dict(good, name)  # passes

    missing = dict(good)
    missing.pop("conv_hr.weight")
    with pytest.raises(ValueError, match="missing.*conv_hr"):
        validate_state_dict(missing, name)

    extra = dict(good)
    extra["conv_up3.weight"] = np.zeros((64, 64, 3, 3), np.float32)
    with pytest.raises(ValueError, match="unexpected.*conv_up3"):
        validate_state_dict(extra, name)

    wrong = dict(good)
    wrong["conv_last.weight"] = np.zeros((3, 64, 1, 1), np.float32)
    with pytest.raises(ValueError, match="shape mismatches"):
        validate_state_dict(wrong, name)
