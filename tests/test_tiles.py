"""Tile engine tests: grid construction, blending exactness, parity between
tiled and untiled model application."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_restore_tpu.ops.conv import conv2d
from video_restore_tpu.ops.tiles import TileGrid, tiled_apply


def _identity(t):
    return t


def test_grid_covers_frame():
    g = TileGrid.build(100, 150, tile=48, overlap=8, scale=2)
    assert g.rows.offsets[0] == 0 and g.cols.offsets[0] == 0
    assert g.rows.offsets[-1] + g.rows.extract == g.rows.padded >= 100
    assert g.cols.offsets[-1] + g.cols.extract == g.cols.padded >= 150
    assert g.n_tiles == len(g.rows.offsets) * len(g.cols.offsets)


def test_single_tile_when_frame_fits():
    g = TileGrid.build(30, 40, tile=64, overlap=8, scale=4)
    assert g.n_tiles == 1
    # snapped to frame, not to the square tile size
    assert g.rows.extract == 30 and g.cols.extract == 40


def test_tile_zero_is_full_frame(rng):
    """tile=0 = no tiling (RealESRGANer tile=0 semantics): one exact
    frame-sized tile, identity blend, even and odd dims."""

    def up4(t):
        return jnp.repeat(jnp.repeat(t, 4, axis=1), 4, axis=2)

    for h, w in ((36, 60), (35, 61)):
        x = jnp.asarray(rng.random((2, h, w, 3)).astype(np.float32))
        g = TileGrid.build(h, w, tile=0, overlap=8, scale=4)
        assert g.n_tiles == 1
        out = tiled_apply(up4, x, g)
        assert out.shape == (2, 4 * h, 4 * w, 3)
        ref = np.repeat(np.repeat(np.asarray(x), 4, axis=1), 4, axis=2)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_tile_zero_config_valid():
    from video_restore_tpu.config import RestoreConfig

    cfg = RestoreConfig(model_name="RealESRGAN_x4plus", tile_size=0)
    assert cfg.tile_size == 0


def test_identity_model_reproduces_input(rng):
    x = jnp.asarray(rng.random((2, 37, 53, 3)).astype(np.float32))
    g = TileGrid.build(37, 53, tile=16, overlap=6, scale=1)
    out = tiled_apply(_identity, x, g)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_identity_model_legacy_mode(rng):
    x = jnp.asarray(rng.random((1, 40, 56, 3)).astype(np.float32))
    g = TileGrid.build(40, 56, tile=16, overlap=4, scale=1, mode="legacy")
    out = tiled_apply(_identity, x, g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-3)


@pytest.mark.parametrize("mode", ["seamless", "legacy"])
def test_conv_model_tiled_matches_untiled_interior(rng, mode):
    """A 3x3 conv model: tiled output must match the untiled forward away
    from tile context edges (halo >= receptive field makes legacy exact in
    the interior; seamless blends context differences smoothly)."""
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 3)).astype(np.float32) * 0.2)

    def model(t):
        return conv2d(t, w)

    x = jnp.asarray(rng.random((1, 40, 48, 3)).astype(np.float32))
    full = np.asarray(model(x))
    g = TileGrid.build(40, 48, tile=16, overlap=8, scale=1, mode=mode)
    tiled = np.asarray(tiled_apply(model, x, g))
    # away from the frame border, outputs should agree closely
    err = np.abs(tiled - full)[:, 4:-4, 4:-4]
    assert err.max() < (1e-4 if mode == "legacy" else 0.02), err.max()


def test_upscaling_tiled_shapes(rng):
    def model2x(t):
        n, h, w, c = t.shape
        return jnp.broadcast_to(
            t[:, :, None, :, None, :], (n, h, 2, w, 2, c)
        ).reshape(n, h * 2, w * 2, c)

    x = jnp.asarray(rng.random((1, 33, 45, 3)).astype(np.float32))
    g = TileGrid.build(33, 45, tile=16, overlap=4, scale=2)
    out = tiled_apply(model2x, x, g)
    assert out.shape == (1, 66, 90, 3)
    # nearest upscale of tiles == nearest upscale of frame in the interior
    full = np.asarray(model2x(x))
    err = np.abs(np.asarray(out) - full)[:, 8:-8, 8:-8]
    assert err.max() < 1e-4


def test_tile_chunking_equivalence(rng):
    x = jnp.asarray(rng.random((1, 40, 40, 3)).astype(np.float32))
    g1 = TileGrid.build(40, 40, tile=16, overlap=4, scale=1, tile_chunk=0)
    g2 = TileGrid.build(40, 40, tile=16, overlap=4, scale=1, tile_chunk=3)
    o1 = np.asarray(tiled_apply(_identity, x, g1))
    o2 = np.asarray(tiled_apply(_identity, x, g2))
    np.testing.assert_allclose(o1, o2, atol=1e-6)


def test_norm_vectors_positive():
    g = TileGrid.build(100, 100, tile=32, overlap=8, scale=4)
    nr = g.rows.norm(4, g.mode, g.halo, g.overlap)
    nc = g.cols.norm(4, g.mode, g.halo, g.overlap)
    assert (nr > 1e-5).all() and (nc > 1e-5).all()


def test_step_program_embeds_no_large_constants(rng):
    """Regression guard: the production step once embedded the full-frame
    overlap-add normalization field as a dense literal (265MB of MLIR at
    4K — large enough to kill the TPU AOT compile helper). Lower the
    flagship step for a reduced frame and assert the program text stays
    small (the constant scaled with frame area, so it would still trip
    this at 1/16 scale)."""
    import dataclasses

    import numpy as np

    from video_restore_tpu.config import RestoreConfig
    from video_restore_tpu.models.zoo import random_model
    from video_restore_tpu.ops.tiles import auto_tile_chunk
    from video_restore_tpu.parallel.dispatch import ShardedUpscaler
    from video_restore_tpu.parallel.mesh import frame_mesh

    h, w = 270, 480
    cfg = RestoreConfig(
        model_name="RealESRGAN_x4plus_anime_6B", tile_size=160,
        tile_overlap=16, enhanced_mode=True, temporal=True,
        audio_copy=False,
    )
    model = random_model(cfg.model_name, dtype=np.float32)
    grid = TileGrid.build(h, w, cfg.tile_size, cfg.tile_overlap, 4)
    chunk = auto_tile_chunk(
        grid.rows.extract, grid.cols.extract, 4, grid.n_tiles
    )
    if chunk:
        grid = dataclasses.replace(grid, tile_chunk=chunk)
    ups = ShardedUpscaler(model, grid, cfg, frame_mesh(1))
    x = ups.stage(np.zeros((1, h, w, 3), np.uint8))
    carry = ups._init_carry()
    txt = ups._step.lower(ups.params, x, carry).as_text()
    # weights travel as arguments; program text must stay tiny. The old
    # bug put ~8MB of dense f32 literal here even at this reduced size.
    assert len(txt) < 3_000_000, f"step MLIR is {len(txt)/1e6:.1f}MB"
