"""Fine-tune CLI + checkpointing."""

import numpy as np
import pytest

from video_restore_tpu.training.finetune import main as finetune_main, sample_patches


@pytest.fixture
def clip(tmp_path, tiny_frames):
    from video_restore_tpu.video import open_writer

    # upscale fixture frames to give patch sampling room
    big = np.kron(tiny_frames, np.ones((1, 4, 4, 1))).astype(np.uint8)
    p = tmp_path / "src.npz"
    with open_writer(p, big.shape[2], big.shape[1], 25) as w:
        for f in big:
            w.write(f)
    return p


def test_sample_patches(clip):
    pats = sample_patches([str(clip)], patch=32, max_patches=16, scale=2)
    assert pats.shape[1:] == (32, 32, 3)
    assert 1 <= pats.shape[0] <= 16
    assert pats.dtype == np.float32 and pats.max() <= 1.0


def test_finetune_cli_end_to_end(clip, tmp_path, monkeypatch):
    monkeypatch.setenv("VRT_ALLOW_RANDOM_WEIGHTS", "1")
    out = tmp_path / "ft.npz"
    rc = finetune_main([
        str(clip), "--model", "RealESRGAN_x4_v3", "--steps", "2",
        "--patch-size", "32", "--max-patches", "8",
        "--out", str(out), "--cpu",
    ])
    assert rc == 0 and out.exists()
    # weights load back into the architecture
    from video_restore_tpu.models.zoo import load_params_npz

    params = load_params_npz("RealESRGAN_x4_v3", out)
    import jax

    assert len(jax.tree.leaves(params)) > 0


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax
    import optax

    from video_restore_tpu.models.srvgg import SRVGGSpec, init_srvgg
    from video_restore_tpu.training.train import (
        restore_checkpoint,
        save_checkpoint,
    )

    spec = SRVGGSpec(num_feat=8, num_conv=2, scale=2)
    params = init_srvgg(jax.random.PRNGKey(0), spec)
    opt_state = optax.adam(1e-3).init(params)
    path = tmp_path / "ckpt"
    save_checkpoint(path, params, opt_state, 7)
    got = restore_checkpoint(
        path, {"params": params, "opt_state": opt_state, "step": 0}
    )
    assert got["step"] == 7
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(got["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
