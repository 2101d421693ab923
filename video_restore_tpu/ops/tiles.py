"""Seamless tile engine: batched overlapping tiles + ramp overlap-add.

Replaces the reference's RealESRGANer tile loop (SURVEY.md §2.2;
/root/reference/video_upscaler.py:326-338), which runs a sequential Python
loop with a host round-trip per tile and pastes tiles with *no* blending
(the "seamless Gaussian blending" its README advertises at README.md:8,34
was never implemented). Here the whole frame goes device-side once:

1. The frame is reflect-padded to a static tile grid (static shapes: one
   compiled program per (H, W, tile, overlap, scale) bucket — no
   recompilation per frame).
2. All tiles are extracted with static slices and batched through the model
   (tiles are the batch axis — MXU-friendly — optionally in chunks to bound
   HBM peak).
3. Output tiles are blended by weighted overlap-add in fp32 using a
   complementary cosine-ramp window (flat interior, smooth fall-off across
   the overlap — a deliberate improvement over the README's "Gaussian"
   wording: adjacent ramps sum to 1, so normalization is exact; see
   :func:`ramp_window`). The normalization field is separable (the window
   is an outer product and the offsets form a grid), so it is two small
   1-D vectors, not an output-sized canvas.

The grid is computed independently per axis, so a 1024 tile on a 1280x720
frame yields 720x1024 tiles rather than wasteful square padding.

Modes:
- ``seamless``: overlapping tiles, ramp window (the advertised behavior).
- ``legacy``: RealESRGANer parity — non-overlapping tile centers, each
  extracted with ``tile_pad`` pixels of real context, center-cropped and
  pasted without blending (video_upscaler.py:326-333, tile_pad=overlap when
  enhanced else 10).
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def ramp_window(size: int, ramp: int) -> np.ndarray:
    """1-D blend window: flat 1 in the interior, smooth Gaussian-shaped
    fall-off to ~0 across the ``ramp`` (=overlap) pixels at each edge.

    Tile-edge pixels carry wrong conv context (the model zero-pads at tile
    borders); confining the fall-off to the overlap region gives them ~0
    weight while the neighbouring tile's *interior* — correct context —
    dominates. Adjacent ramps are complementary (sum to 1), so away from
    frame borders normalization is exact."""
    w = np.ones(size, dtype=np.float64)
    ramp = min(ramp, size // 2)
    if ramp > 0:
        t = (np.arange(ramp) + 0.5) / ramp  # (0, 1)
        r = 0.5 - 0.5 * np.cos(np.pi * t)  # smooth 0 -> 1
        w[:ramp] = r
        w[size - ramp :] = r[::-1]
    return np.maximum(w, 1e-4)


@dataclasses.dataclass(frozen=True)
class _Axis:
    """Static tiling plan along one spatial axis."""

    dim: int  # original frame extent
    extract: int  # model input extent for this axis
    offsets: Tuple[int, ...]
    padded: int  # padded frame extent
    lead: int  # leading context pad (legacy halo)

    @staticmethod
    def build(
        dim: int, tile: int, stride: int, halo: int, mod: int,
        even: bool = True,
    ) -> "_Axis":
        extract = tile + 2 * halo
        if extract >= dim + 2 * halo:
            # single tile along this axis: snap extract to the frame
            extract = _round_up(dim, mod)
            return _Axis(dim, extract, (0,), extract, 0)
        covered = dim + 2 * halo
        n = math.ceil((covered - extract) / stride) + 1
        if even:
            # Treat ``tile`` as a *budget*: shrink the extract so the n
            # tiles exactly cover the frame with (at least) the requested
            # overlap, instead of overlapping by whatever a fixed stride
            # leaves over. 1080p/tile512/ov32 drops from 12x512^2 to
            # 12x384x504 tile pixels — 1.36x less model compute. Extents
            # are rounded to 8 (sublane granule; also satisfies the
            # scale-2 mod-2 requirement).
            overlap = extract - stride
            extract = min(
                extract,
                _round_up(math.ceil((covered + (n - 1) * overlap) / n), 8),
            )
            span = covered - extract
            offsets = tuple(round(i * span / (n - 1)) for i in range(n))
            return _Axis(dim, extract, offsets, covered, halo)
        # legacy (RealESRGANer) semantics: fixed stride, pad past the edge
        padded = (n - 1) * stride + extract
        return _Axis(
            dim, extract, tuple(i * stride for i in range(n)), padded, halo
        )

    def window(self, scale: int, mode: str, halo: int, overlap: int = 0) -> np.ndarray:
        es = self.extract * scale
        if len(self.offsets) == 1:
            return np.ones(es)
        if mode == "legacy":
            w = np.full(es, 1e-6)  # ~hard paste: halo contamination < 1e-6
            h = halo * scale
            w[h : es - h if h else es] = 1.0
            return w
        return ramp_window(es, overlap * scale)

    def norm(self, scale: int, mode: str, halo: int, overlap: int = 0) -> np.ndarray:
        w = self.window(scale, mode, halo, overlap)
        n = np.zeros(self.padded * scale)
        for o in self.offsets:
            n[o * scale : o * scale + len(w)] += w
        return n


@dataclasses.dataclass(frozen=True)
class TileGrid:
    """Static tiling plan for one (H, W) resolution bucket."""

    height: int
    width: int
    tile: int
    overlap: int
    scale: int
    mode: str = "seamless"  # 'seamless' | 'legacy'
    tile_chunk: int = 0  # >0: run tiles through the model in chunks
    rows: _Axis = None  # type: ignore[assignment]
    cols: _Axis = None  # type: ignore[assignment]
    halo: int = 0

    @staticmethod
    def build(
        height: int,
        width: int,
        tile: int,
        overlap: int,
        scale: int,
        mode: str = "seamless",
        tile_chunk: int = 0,
    ) -> "TileGrid":
        if mode not in ("seamless", "legacy"):
            raise ValueError(f"unknown tile mode {mode!r}")
        if tile == 0:
            # no tiling (RealESRGANer tile=0): one frame-sized tile per
            # axis — the _Axis single-tile snap covers the frame exactly
            # and the blend collapses to an identity crop.
            tile = _round_up(max(height, width), 2)
        # mod-pad granularity: scale-2 RRDBNet pixel-unshuffles the input by 2
        mod = 2
        if mode == "legacy":
            halo = _round_up(overlap, mod)
            stride = tile
        else:
            halo = 0
            stride = max(tile - overlap, mod)
        even = mode == "seamless"
        rows = _Axis.build(height, tile, stride, halo, mod, even)
        cols = _Axis.build(width, tile, stride, halo, mod, even)
        return TileGrid(
            height=height,
            width=width,
            tile=tile,
            overlap=overlap,
            scale=scale,
            mode=mode,
            tile_chunk=tile_chunk,
            rows=rows,
            cols=cols,
            halo=halo,
        )

    @property
    def n_tiles(self) -> int:
        return len(self.rows.offsets) * len(self.cols.offsets)

    @property
    def tile_shape(self) -> Tuple[int, int]:
        return (self.rows.extract, self.cols.extract)


def auto_tile_chunk(
    extract_h: int,
    extract_w: int,
    scale: int,
    n_tiles: int,
    budget_bytes: int = 2 << 30,
    feat_ch: int = 64,
) -> int:
    """Pick how many tiles to batch through the model per lax.map step so
    the dominant activation (feat_ch channels at output resolution, bf16)
    stays within ``budget_bytes`` — the TPU analogue of the reference's
    VRAM-driven tile-size presets (video_upscaler.py:687-701)."""
    per_tile = extract_h * extract_w * scale * scale * feat_ch * 2
    chunk = max(1, budget_bytes // max(per_tile, 1))
    if chunk >= n_tiles:
        return 0
    # prefer a divisor of n_tiles: a non-divisor pads the last lax.map
    # chunk with dead tiles (chunk=5 on 12 tiles computes 15)
    for c in range(int(chunk), 0, -1):
        if n_tiles % c == 0:
            return c
    return int(chunk)


def auto_full_frame(
    height: int,
    width: int,
    scale: int,
    hbm_bytes: int | None = None,
    feat_ch: int = 64,
    frames: int = 1,
) -> bool:
    """Decide whether a full-frame (tile=0) pass fits device HBM.

    The 2D-blocked stripe kernels bound VMEM at (bh+10)x(bw+16) for any
    frame width, so the body can run full-frame; what limits full-frame
    mode is the HBM peak of the activations. Estimate (TPU stripe path
    with the fused Pallas tail): ~5 body-feat buffers (bf16, padded
    chain double-buffer + residual + conv_body), the upconv1 output at
    2x resolution, and ~3 output-resolution RGB fp32 buffers (tail
    output + post stack). Full-frame beats tiling when it fits: no tile
    overlap MACs and the 2D form's taller stripes measured +14.5% on
    frame MACs (BENCH_NOTES round 3).
    """
    if hbm_bytes is None:
        env = os.environ.get("VRT_HBM_BYTES")
        if env and env.isdigit():
            hbm_bytes = int(env)
        else:
            try:
                d = jax.devices()[0]
                stats = d.memory_stats() or {}
                hbm_bytes = stats.get("bytes_limit")
                if hbm_bytes is None and d.platform == "tpu":
                    # some TPU runtimes (the axon tunnel among them)
                    # report no memory stats; every deployed TPU
                    # generation has >= 16 GiB HBM per chip, so that is
                    # a safe floor for a real TPU
                    hbm_bytes = 16 << 30
            except Exception:
                hbm_bytes = None
        if hbm_bytes is None:
            # non-TPU runtime without an HBM limit (and no VRT_HBM_BYTES
            # override): keep tiling rather than auto-upgrading to a
            # full-frame program that may not fit
            return False
    hw = height * width
    body = 5 * hw * feat_ch * 2
    up1 = 4 * hw * feat_ch * 2
    out_rgb = 3 * (scale * scale * hw) * 3 * 4
    # frames = frames processed per device per model call
    # (--frames-per-batch); the activations scale with it
    est = (body + up1 + out_rgb) * max(frames, 1)
    return est <= 0.5 * hbm_bytes


def _pad_frame(x: jax.Array, grid: TileGrid) -> jax.Array:
    """Reflect-pad (N, H, W, C) to the grid's padded extent (legacy mode adds
    a leading halo of real reflected context, like RealESRGANer's
    edge-clamped context pads)."""
    r, c = grid.rows, grid.cols
    pads = (
        (0, 0),
        (r.lead, r.padded - r.dim - r.lead),
        (c.lead, c.padded - c.dim - c.lead),
        (0, 0),
    )
    big = max(r.lead, r.padded - r.dim - r.lead, c.lead, c.padded - c.dim - c.lead)
    mode = "reflect" if big < min(r.dim, c.dim) else "edge"
    return jnp.pad(x, pads, mode=mode)


def _extract_tiles(xp: jax.Array, grid: TileGrid) -> jax.Array:
    """(N, pad_h, pad_w, C) -> (N, n_tiles, Eh, Ew, C) with static slices."""
    eh, ew = grid.tile_shape
    tiles = [
        xp[:, r : r + eh, c : c + ew, :]
        for r in grid.rows.offsets
        for c in grid.cols.offsets
    ]
    return jnp.stack(tiles, axis=1)


def _blend_tiles(out_tiles: jax.Array, grid: TileGrid) -> jax.Array:
    """(N, n_tiles, Eh*s, Ew*s, C) -> (N, H*s, W*s, C), fp32 overlap-add."""
    s = grid.scale
    n, c = out_tiles.shape[0], out_tiles.shape[-1]
    wr = jnp.asarray(
        grid.rows.window(s, grid.mode, grid.halo, grid.overlap), jnp.float32
    )
    wc = jnp.asarray(
        grid.cols.window(s, grid.mode, grid.halo, grid.overlap), jnp.float32
    )
    w2d = (wr[:, None] * wc[None, :])[None, :, :, None]
    weighted = out_tiles.astype(jnp.float32) * w2d

    canvas = jnp.zeros(
        (n, grid.rows.padded * s, grid.cols.padded * s, c), jnp.float32
    )
    ehs, ews = grid.rows.extract * s, grid.cols.extract * s
    idx = 0
    for r in grid.rows.offsets:
        for col in grid.cols.offsets:
            canvas = canvas.at[
                :, r * s : r * s + ehs, col * s : col * s + ews, :
            ].add(weighted[:, idx])
            idx += 1

    nr = grid.rows.norm(s, grid.mode, grid.halo, grid.overlap)
    nc = grid.cols.norm(s, grid.mode, grid.halo, grid.overlap)
    # form the separable normalization field ON DEVICE from its two 1-D
    # factors: the numpy outer product embedded a full-4K-frame f32 dense
    # literal in every program (265MB of MLIR text — large enough to OOM
    # the AOT compile helper); two 1-D constants are a few KB and the
    # broadcast multiply is bit-identical
    norm = (
        jnp.asarray(nr, jnp.float32)[:, None]
        * jnp.asarray(nc, jnp.float32)[None, :]
    )[None, :, :, None]
    canvas = canvas / norm
    top, left = grid.rows.lead * s, grid.cols.lead * s
    return canvas[
        :, top : top + grid.height * s, left : left + grid.width * s, :
    ]


def _chunked_apply(
    model_fn: Callable[[jax.Array], jax.Array],
    tiles: jax.Array,
    chunk: int,
) -> jax.Array:
    """Apply the model over the tile batch, optionally in fixed-size chunks
    via lax.map to bound peak HBM (the TPU analogue of the reference's
    VRAM-driven tile_size knob)."""
    b = tiles.shape[0]
    if chunk <= 0 or chunk >= b:
        return model_fn(tiles)
    nb = _round_up(b, chunk)
    if nb != b:
        pad = jnp.zeros((nb - b,) + tiles.shape[1:], tiles.dtype)
        tiles = jnp.concatenate([tiles, pad], axis=0)
    tiles = tiles.reshape((nb // chunk, chunk) + tiles.shape[1:])
    out = lax.map(model_fn, tiles)
    out = out.reshape((nb,) + out.shape[2:])
    return out[:b]


def tiled_apply(
    model_fn: Callable[[jax.Array], jax.Array],
    frames: jax.Array,
    grid: TileGrid,
    tile_sharding=None,
) -> jax.Array:
    """Upscale a batch of frames through the tiled model, fully on-device.

    frames: (N, H, W, C) float in [0, 1] (any float dtype; the model runs in
    the frames' dtype, blending runs in fp32).
    Returns (N, H*scale, W*scale, C) fp32.

    tile_sharding: optional ``NamedSharding`` for the flattened tile batch
    axis — "spatial parallelism": all mesh devices cooperate on one frame's
    tiles (single-stream/low-latency mode; the image-domain analogue of
    sequence parallelism, SURVEY.md §5). GSPMD partitions the per-tile
    model and gathers outputs for the blend.
    """
    n = frames.shape[0]
    xp = _pad_frame(frames, grid)
    tiles = _extract_tiles(xp, grid)  # (N, T, Eh, Ew, C)
    flat = tiles.reshape((n * grid.n_tiles,) + tiles.shape[2:])
    if tile_sharding is not None:
        d = tile_sharding.mesh.devices.size
        nb = _round_up(flat.shape[0], d)
        if nb != flat.shape[0]:
            pad = jnp.zeros((nb - flat.shape[0],) + flat.shape[1:], flat.dtype)
            flat = jnp.concatenate([flat, pad], axis=0)
        flat = jax.lax.with_sharding_constraint(flat, tile_sharding)
        out = model_fn(flat)
        out = out[: n * grid.n_tiles]
    else:
        out = _chunked_apply(model_fn, flat, grid.tile_chunk)
    out = out.reshape((n, grid.n_tiles) + out.shape[1:])
    if (
        grid.n_tiles == 1
        and grid.rows.padded == grid.rows.dim
        and grid.cols.padded == grid.cols.dim
        and grid.rows.lead == 0
        and grid.cols.lead == 0
    ):
        # full-frame mode: single exact tile, window is all-ones — skip
        # the overlap-add canvas (3 full-output-frame copies at 8K).
        # VRT_POST_DT=bf16 keeps the model dtype into the post stack
        # (halves every post op's HBM traffic at 8K; quantization noise
        # ~66dB PSNR, far above the 45dB golden bar) — default fp32.
        if os.environ.get("VRT_POST_DT") == "bf16":
            return out[:, 0]
        return out[:, 0].astype(jnp.float32)
    return _blend_tiles(out, grid)
