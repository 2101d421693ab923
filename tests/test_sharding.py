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


def test_post_dt_bf16_matches_f32(tiny_frames, monkeypatch):
    """VRT_POST_DT=bf16 (post stack stays in the model dtype after a
    full-frame tile) matches the fp32 post stack within 1 u8 LSB on the
    full enhanced+temporal step. Pins the f32-forced statistic
    reductions (mdelta, luma hist) under a bf16 frame dtype."""
    model = _tiny_model()
    h, w = tiny_frames.shape[1:3]
    grid = TileGrid.build(h, w, 0, 4, 2)  # full-frame: tile=0
    assert grid.n_tiles == 1
    # both runs use a bf16 model so the ONLY delta is the post stack's
    # dtype (the knob is a no-op for an fp32 model output)
    cfg = _cfg(
        enhanced_mode=True, sharpen=0.3, color_enhance=True,
        temporal=True, tile_size=0, precision="bf16",
    )
    ref = np.asarray(
        ShardedUpscaler(model, grid, cfg, frame_mesh(8)).process_batch(
            tiny_frames
        )
    )
    monkeypatch.setenv("VRT_POST_DT", "bf16")
    got = np.asarray(
        ShardedUpscaler(model, grid, cfg, frame_mesh(8)).process_batch(
            tiny_frames
        )
    )
    diff = np.abs(got.astype(int) - ref.astype(int))
    assert diff.max() <= 2, diff.max()
    assert (diff > 1).mean() < 0.01


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


# ---- temporal carry semantics (restore_step level) ----------------------

from video_restore_tpu.parallel.dispatch import StepConfig, restore_step


def _identity_step(
    frames_u8, carry, *, strength=0.5, n_shards=1, cut=0.12, cut_hist=0.35
):
    """restore_step with a nearest-upsample 'model' so pixel values are
    exactly predictable."""
    grid = TileGrid.build(
        frames_u8.shape[1], frames_u8.shape[2], 16, 4, 2
    )

    def apply_fn(params, t):
        return jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2).astype(
            jnp.float32
        )

    cfg = StepConfig(
        temporal=True, temporal_strength=strength, scene_cut_thresh=cut,
        scene_cut_hist=cut_hist,
    )
    return restore_step(
        None,
        jnp.asarray(frames_u8),
        carry,
        model_apply=apply_fn,
        grid=grid,
        step_cfg=cfg,
        compute_dtype=jnp.float32,
        n_shards=n_shards,
    )


def _fresh_carry(n_shards, hs, ws):
    return {
        "frame": jnp.zeros((n_shards, hs, ws, 3), jnp.uint8),
        "valid": jnp.zeros((n_shards,), jnp.float32),
    }


def test_temporal_black_frame_is_valid_prev():
    """An all-black previous frame must act as a real previous frame, not
    as the stream-start sentinel (VERDICT r1 #6)."""
    h, w = 32, 32
    black = np.zeros((1, h, w, 3), np.uint8)
    dim = np.full((1, h, w, 3), 10, np.uint8)

    carry = _fresh_carry(1, h * 2, w * 2)
    out0, carry = _identity_step(black, carry)
    assert np.asarray(out0).max() == 0  # stream start: passthrough
    assert float(carry["valid"][0]) == 1.0

    out1, _ = _identity_step(dim, carry)
    # fresh-stream run of the same frame: no previous -> passthrough
    out_fresh, _ = _identity_step(dim, _fresh_carry(1, h * 2, w * 2))
    assert np.asarray(out_fresh).max() == 10
    # continuing run: blended toward the black previous frame
    assert np.asarray(out1).max() < 10


def test_temporal_scene_cut_passthrough():
    """A hard cut must reset the EMA: output bit-identical to a fresh
    stream."""
    h, w = 32, 32
    a = np.full((1, h, w, 3), 51, np.uint8)   # 0.2
    b = np.full((1, h, w, 3), 204, np.uint8)  # 0.8 -> mean delta 0.6 >> 0.12

    carry = _fresh_carry(1, h * 2, w * 2)
    _, carry = _identity_step(a, carry)
    out_cut, carry2 = _identity_step(b, carry)
    out_fresh, _ = _identity_step(b, _fresh_carry(1, h * 2, w * 2))
    np.testing.assert_array_equal(np.asarray(out_cut), np.asarray(out_fresh))
    # and the carry after the cut is the new scene's frame
    np.testing.assert_array_equal(
        np.asarray(carry2["frame"][0]), np.asarray(out_cut)[0]
    )


def test_scene_cut_hist_vetoes_motion_false_cut():
    """A borderline mean-delta trip caused by localized motion must NOT
    reset the EMA when the luma histogram barely changes (ROADMAP: cut
    detection beyond the mean-delta gate); with the histogram detector
    disabled the same frames false-cut."""
    h, w = 32, 32
    base = np.full((1, h, w, 3), 100, np.uint8)
    # next frame: static background, a 4-row strip at +2 (near-static
    # content whose blending is observable), and a 16x16 box jumping to
    # 255 — mean delta ~0.15 > 0.12 trips the mean-delta test, but only
    # ~28% of histogram mass moves (tvd < 0.35)
    nxt = base.copy()
    nxt[:, 0:4, :, :] += 2
    nxt[:, 8:24, 8:24, :] = 255

    def run(cut_hist):
        carry = _fresh_carry(1, h * 2, w * 2)
        _, carry = _identity_step(base, carry, strength=1.0)
        out, _ = _identity_step(
            nxt, carry, strength=1.0, cut_hist=cut_hist
        )
        return np.asarray(out)

    raw = np.asarray(nxt).repeat(2, 1).repeat(2, 2)
    out_hist = run(cut_hist=0.35)
    out_nohist = run(cut_hist=0.0)
    # hist veto: background pixels blend toward 100 (output < raw 102)
    assert out_hist[0, 0, 0, 0] < 102
    # moving box passes through regardless (pixel motion gate)
    assert out_hist[0, 32, 32, 0] == 255
    # without the histogram, the borderline trip hard-cuts: bit-exact raw
    np.testing.assert_array_equal(out_nohist, raw)


def test_scene_cut_hist_confirms_real_cut():
    """A genuine content change in the borderline-delta band (mean delta
    between 1x and 2.5x the threshold) still cuts: the histogram moves
    with the content."""
    h, w = 32, 32
    a = np.full((1, h, w, 3), 100, np.uint8)
    b = np.full((1, h, w, 3), 150, np.uint8)  # delta 0.196, tvd ~1.0

    carry = _fresh_carry(1, h * 2, w * 2)
    _, carry = _identity_step(a, carry, strength=1.0)
    out, _ = _identity_step(b, carry, strength=1.0)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(b).repeat(2, 1).repeat(2, 2)
    )


def test_temporal_multidevice_stale_carry_gate():
    """D>1 pins the intended approximation (ADVICE r1): the cross-batch
    carry is B-k+1 frames stale; static content still blends, content in
    steady motion is gated as strictly as in the sequential case."""
    h, w, d = 16, 16, 8
    base = np.full((d, h, w, 3), 100, np.uint8)

    # near-static: +1 gray level between batches -> blend engages
    # (w = exp(-(1/255) * 8 / 0.05) = 0.53 at strength 1)
    carry = _fresh_carry(d, h * 2, w * 2)
    out0, carry = _identity_step(base, carry, n_shards=d, strength=1.0)
    nxt = base + 1
    out1, _ = _identity_step(nxt, carry, n_shards=d, strength=1.0)
    # blended below the raw value 101 on every shard
    assert np.asarray(out1).max() < 101

    # moving content: delta 13/255 * gap 8 >> sigma -> passthrough
    carry = _fresh_carry(d, h * 2, w * 2)
    _, carry = _identity_step(base, carry, n_shards=d, cut=1.0)
    far = base + 13
    out2, _ = _identity_step(far, carry, n_shards=d, cut=1.0)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(far).repeat(2, 1).repeat(2, 2))
