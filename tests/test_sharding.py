"""Multi-device frame sharding on the 8-virtual-CPU-device mesh.

The idiomatic 'fake backend' test (SURVEY.md §4): sharded output must be
identical to single-device output, and the mesh must actually have 8
devices.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_restore_tpu.config import RestoreConfig
from video_restore_tpu.models.srvgg import SRVGGSpec, init_srvgg
from video_restore_tpu.models.zoo import ModelHandle
from video_restore_tpu.ops.tiles import TileGrid
from video_restore_tpu.parallel.dispatch import ShardedUpscaler
from video_restore_tpu.parallel.mesh import frame_mesh


def _tiny_model(scale=2):
    spec = SRVGGSpec(num_feat=8, num_conv=2, scale=scale)
    params = init_srvgg(jax.random.PRNGKey(0), spec)
    return ModelHandle("tiny", spec, params)


def _cfg(**kw):
    defaults = dict(
        model_name="RealESRGAN_x4_v3", tile_size=16, tile_overlap=4,
        precision="fp32", audio_copy=False,
    )
    defaults.update(kw)
    return RestoreConfig(**defaults)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = frame_mesh()
    assert mesh.devices.size == 8


def test_sharded_matches_single_device(tiny_frames):
    model = _tiny_model()
    h, w = tiny_frames.shape[1:3]
    grid = TileGrid.build(h, w, 16, 4, 2)

    ups8 = ShardedUpscaler(model, grid, _cfg(), frame_mesh(8))
    ups1 = ShardedUpscaler(model, grid, _cfg(), frame_mesh(1))

    out8 = np.asarray(ups8.process_batch(tiny_frames))
    outs1 = [
        np.asarray(ups1.process_batch(tiny_frames[i : i + 1]))[0]
        for i in range(len(tiny_frames))
    ]
    assert out8.shape == (8, h * 2, w * 2, 3)
    assert out8.dtype == np.uint8
    for i in range(8):
        diff = np.abs(out8[i].astype(int) - outs1[i].astype(int))
        assert diff.max() <= 1, f"frame {i}: {diff.max()}"


def test_sharded_enhanced_stack_runs(tiny_frames):
    model = _tiny_model()
    h, w = tiny_frames.shape[1:3]
    grid = TileGrid.build(h, w, 16, 4, 2)
    cfg = _cfg(
        enhanced_mode=True, denoise=0.5, sharpen=0.3,
        color_enhance=True, temporal=True,
    )
    ups = ShardedUpscaler(model, grid, cfg, frame_mesh(8))
    out = np.asarray(ups.process_batch(tiny_frames))
    assert out.shape == (8, h * 2, w * 2, 3)
    # second batch exercises the temporal carry path
    out2 = np.asarray(ups.process_batch(tiny_frames))
    assert out2.shape == out.shape


def test_temporal_carry_single_device_sequential(tiny_frames):
    """With one device, batch-to-batch temporal carry must chain exactly
    like one long sequence."""
    model = _tiny_model()
    h, w = tiny_frames.shape[1:3]
    grid = TileGrid.build(h, w, 16, 4, 2)
    cfg = _cfg(enhanced_mode=True, temporal=True, denoise=0.0,
               color_enhance=False, sharpen=0.0)

    ups_a = ShardedUpscaler(model, grid, cfg, frame_mesh(1))
    seq = [
        np.asarray(ups_a.process_batch(tiny_frames[i : i + 1]))[0]
        for i in range(4)
    ]

    ups_b = ShardedUpscaler(model, grid, cfg, frame_mesh(1))
    cfg2 = cfg
    big = []
    for i in range(0, 4, 2):
        out = np.asarray(ups_b.process_batch(tiny_frames[i : i + 2]))
        big.extend(out)

    # Note: batching 2 frames on 1 device scans both in one call; results
    # must match the frame-at-a-time sequence within rounding.
    for a, b in zip(seq, big):
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_tile_sharded_matches_frame_sharded(tiny_frames):
    """'tiles' shard mode (spatial parallelism) must produce the same
    pixels as the frame-sharded mode."""
    model = _tiny_model()
    h, w = tiny_frames.shape[1:3]
    grid = TileGrid.build(h, w, 16, 4, 2)
    ups_t = ShardedUpscaler(
        model, grid, _cfg(shard_mode="tiles"), frame_mesh(8)
    )
    ups_f = ShardedUpscaler(model, grid, _cfg(), frame_mesh(8))
    out_f = np.asarray(ups_f.process_batch(tiny_frames))
    outs_t = [
        np.asarray(ups_t.process_batch(tiny_frames[i : i + 1]))[0]
        for i in range(len(tiny_frames))
    ]
    for i in range(8):
        diff = np.abs(out_f[i].astype(int) - outs_t[i].astype(int))
        assert diff.max() <= 1, f"frame {i}: {diff.max()}"


def test_tile_sharded_enhanced_runs(tiny_frames):
    model = _tiny_model()
    h, w = tiny_frames.shape[1:3]
    grid = TileGrid.build(h, w, 16, 4, 2)
    cfg = _cfg(shard_mode="tiles", enhanced_mode=True, temporal=True,
               denoise=0.4)
    ups = ShardedUpscaler(model, grid, cfg, frame_mesh(8))
    out = np.asarray(ups.process_batch(tiny_frames[:1]))
    assert out.shape == (1, h * 2, w * 2, 3)


def test_batch_not_divisible_raises(tiny_frames):
    model = _tiny_model()
    grid = TileGrid.build(48, 64, 16, 4, 2)
    ups = ShardedUpscaler(model, grid, _cfg(), frame_mesh(8))
    with pytest.raises(ValueError):
        ups.process_batch(tiny_frames[:5])
