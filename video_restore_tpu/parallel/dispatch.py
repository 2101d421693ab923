"""Sharded, fused restoration step.

One jitted program per (resolution bucket, config): uint8 frames in ->
uint8 frames out, with the full enhancement stack fused on-device:

    u8 -> f32/255 -> [bilateral denoise] -> tiled model (bf16 MXU) ->
    [CLAHE] -> [unsharp] -> [temporal EMA] -> u8

The frame batch axis is sharded over the mesh's ``data`` axis; params are
replicated. Frames are independent, so XLA inserts no collectives — this is
the TPU-native replacement for the reference's per-GPU threads + shared
queue (which silently drop frames, SURVEY.md §2.6 #1). Transfers move uint8
(4x less host<->device traffic than float32).

Temporal consistency note: the EMA is sequential in time. Each device scans
its own contiguous chunk of frames (lax.scan over the per-device time axis)
and carries its chunk's last output across batches. With one carry shard
(single device, or 'tiles' shard mode) that is exactly sequential. With
D > 1 frame shards the cross-batch carry is *stale*: chunk d's carry is the
same chunk's last output from the previous batch, i.e. gap = B - k + 1
frames back instead of 1. The blend stays safe because the motion gate is
displacement-invariant — the exp length-scale is divided by the gap, so a
carry g frames old must clear a g-times stricter static-ness bar; content
moving at any steady speed sees the same effective gate as in the
sequential case, and truly static regions (where the EMA has any effect)
are identical g frames apart. A per-frame scene-cut detector hard-resets
the blend: a mean-luma-delta trip (> scene_cut_thresh) confirmed by a
luma-histogram change (total-variation distance > scene_cut_hist — the
histogram is invariant to pans/zooms, so fast motion of one scene no
longer false-cuts), with an overwhelming delta (> 2.5x thresh) cutting on
its own. The carry is an explicit {frame, valid} pair, so an all-black
previous frame is still a valid previous frame (it is not a stream-start
sentinel).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_restore_tpu.config import RestoreConfig
from video_restore_tpu.models.zoo import ModelHandle
from video_restore_tpu.ops.post import bilateral_filter, clahe, unsharp_mask
from video_restore_tpu.ops.tiles import TileGrid, tiled_apply
from video_restore_tpu.parallel.mesh import frame_mesh


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static (hashable) slice of RestoreConfig that shapes the program."""

    denoise: float = 0.0
    sharpen: float = 0.0
    color_enhance: bool = False
    clahe_clip: float = 2.0
    clahe_lr: bool = True  # CLAHE on the LR input (16x cheaper than at 4K)
    temporal: bool = False
    temporal_strength: float = 0.3
    scene_cut_thresh: float = 0.12  # mean |delta| (0-1 units) => hard reset
    scene_cut_hist: float = 0.35  # luma-hist TV distance => hard reset (0=off)
    yuv420_out: bool = False  # emit planar I420 on-device (halves D2H)
    dither: bool = False  # ordered-dithered 8-bit quantization (anti-band)

    @staticmethod
    def from_config(cfg: RestoreConfig) -> "StepConfig":
        dither = getattr(cfg, "dither", False)
        if not cfg.enhanced_mode:
            # explicit --denoise/--sharpen strengths are honoured even
            # without --enhanced; the enhanced flag adds CLAHE + temporal
            return StepConfig(
                denoise=cfg.denoise, sharpen=cfg.sharpen, dither=dither
            )
        return StepConfig(
            denoise=cfg.denoise,
            sharpen=cfg.sharpen,
            color_enhance=cfg.color_enhance,
            clahe_clip=cfg.clahe_clip,
            clahe_lr=cfg.clahe_lr,
            temporal=cfg.temporal,
            temporal_strength=cfg.temporal_strength,
            scene_cut_thresh=cfg.scene_cut_thresh,
            scene_cut_hist=getattr(cfg, "scene_cut_hist", 0.35),
            dither=dither,
        )


_HIST_BINS = 32


def _luma_hist(x: jax.Array) -> jax.Array:
    """Soft-binned luma histogram: (..., H, W, 3) float 0-1 ->
    (..., _HIST_BINS) normalized. Gather-free (compare/relu-reduce, same
    family as the CLAHE histogram in ops/post.py) and soft-binned with a
    triangular kernel so a small global luma shift moves mass
    proportionally between adjacent bins instead of cliff-jumping."""
    luma = (
        0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    )  # (..., H, W)
    pos = jnp.clip(
        jnp.clip(luma, 0.0, 1.0) * _HIST_BINS - 0.5, 0.0, _HIST_BINS - 1.0
    )  # edge clamp: boundary pixels keep full mass in the edge bin
    centers = jnp.arange(_HIST_BINS, dtype=jnp.float32)
    w = jnp.maximum(
        0.0, 1.0 - jnp.abs(pos.astype(jnp.float32)[..., None] - centers)
    )
    # f32 accumulation regardless of the frame dtype (a bf16 mean over
    # millions of elements drops the per-pixel increments entirely)
    return w.mean(axis=(-3, -2), dtype=jnp.float32)


def restore_step(
    params: Any,
    frames_u8: jax.Array,
    carry: dict,
    *,
    model_apply,
    grid: TileGrid,
    step_cfg: StepConfig,
    compute_dtype,
    n_shards: int,
    tile_sharding=None,
) -> Tuple[jax.Array, dict]:
    """(B, H, W, 3) uint8 -> (B, H*s, W*s, 3) uint8 + temporal carry.

    carry: {"frame": (n_shards, H*s, W*s, 3) uint8 — last output frame per
    device chunk; "valid": (n_shards,) float32 in {0, 1} — 1 once the chunk
    has a previous frame}. The explicit flag (not a zero-frame sentinel)
    keeps an all-black previous frame distinguishable from stream start.
    """
    x = frames_u8.astype(jnp.float32) * (1.0 / 255.0)

    if step_cfg.denoise > 0:
        # reference pre-filter: cv2.bilateralFilter(frame, 5, 25, 25) at
        # video_upscaler.py:496; strength 0.5 reproduces those sigmas.
        sig = 50.0 * step_cfg.denoise
        x = bilateral_filter(x, 5, sig, sig)
    if step_cfg.color_enhance and step_cfg.clahe_lr:
        # contrast correction is resolution-agnostic; running it on the LR
        # input costs 1/scale^2 of the HR-side cost (measured 1.49s -> 90ms
        # per 1080p->4K frame) with visually identical results.
        x = clahe(x, step_cfg.clahe_clip)

    x = x.astype(compute_dtype)
    y = tiled_apply(
        lambda t: model_apply(params, t), x, grid,
        tile_sharding=tile_sharding,
    )  # fp32

    if step_cfg.color_enhance and not step_cfg.clahe_lr:
        y = clahe(y, step_cfg.clahe_clip)
    if step_cfg.sharpen > 0:
        import os as _os

        _uk = _os.environ.get("VRT_UNSHARP_KERNEL", "1") != "0"
        try:
            _uk = _uk and jax.default_backend() == "tpu"
        except Exception:
            _uk = False
        if _uk:
            # fused single-pass stripe kernel: one HBM read + one write
            # vs XLA's padded-intermediate round-trips. Isolated 8K A/B
            # on v5e: 26.1 -> 7.6 ms/frame fp32 (3.4x), 7.1 ms bf16.
            # Production default on TPU; VRT_UNSHARP_KERNEL=0 opts out.
            from video_restore_tpu.ops.pallas_post import unsharp_fused

            y = unsharp_fused(
                y, amount=step_cfg.sharpen, sigma=1.5, radius=4
            )
        else:
            y = unsharp_mask(
                y, amount=step_cfg.sharpen, sigma=1.5, radius=4
            )

    if step_cfg.temporal:
        b = y.shape[0]
        k = b // n_shards
        yc = y.reshape((n_shards, k) + y.shape[1:])
        # EMA blends run in y's dtype (bf16 under VRT_POST_DT=bf16 —
        # halves the 8K HBM traffic); the frame-statistic reductions
        # below force f32 accumulation regardless
        prev = carry["frame"].astype(y.dtype) * (1.0 / 255.0)
        # scan over the per-device time axis; devices advance in lockstep
        yt = jnp.moveaxis(yc, 1, 0)  # (k, D, Hs, Ws, C)
        # Step 0's carry is gap0 frames old (1 when there is a single carry
        # shard, B - k + 1 when D chunks advance one batch at a time);
        # subsequent steps within the chunk are exactly sequential (gap 1).
        gap0 = float(b - k + 1)
        gaps = jnp.concatenate(
            [jnp.full((1,), gap0, jnp.float32), jnp.ones((k - 1,), jnp.float32)]
        )
        valids = jnp.concatenate(
            [carry["valid"][None], jnp.ones((k - 1, n_shards), jnp.float32)]
        )

        # per-frame luma histograms for the cut detector, vectorized once
        # outside the scan; the scan carries the previous frame's histogram
        # alongside the frame itself (ROADMAP: "scene-cut detection beyond
        # the motion-adaptive EMA gate" — the histogram is invariant to
        # pans/zooms, so it separates content change from fast motion,
        # which the mean-delta test alone cannot)
        use_hist = step_cfg.scene_cut_hist > 0
        if use_hist:
            h_all = _luma_hist(yt)  # (k, D, BINS)
            h_prev = _luma_hist(prev)  # (D, BINS)
        else:
            h_all = jnp.zeros(yt.shape[:2] + (1,), jnp.float32)
            h_prev = jnp.zeros((n_shards, 1), jnp.float32)

        # EMA elementwise over the (sharded) device axis, scanned over time
        def scan_fn(c, xs):
            cf, ch = c
            fr, hf, gap, valid = xs
            diff = jnp.abs(fr - cf).mean(axis=-1, keepdims=True)
            # displacement-invariant gate: a gap-frames-old carry must be
            # gap times more static to blend at the same weight
            w = step_cfg.temporal_strength * jnp.exp(
                -diff * (gap.astype(fr.dtype) / 0.05)
            )
            w = w * valid.astype(fr.dtype)[:, None, None, None]
            # scene cut: pass the new frame through untouched. The
            # whole-frame mean MUST accumulate in f32 (a bf16 reduction
            # over 33M elements loses the increments entirely)
            mdelta = diff.mean(
                axis=(1, 2, 3), keepdims=True, dtype=jnp.float32
            ).astype(fr.dtype)
            if use_hist:
                # total-variation distance between luma histograms: ~0 for
                # pans/zooms of the same content, ~1 across a hard cut.
                # The histogram CONFIRMS a borderline delta trip (fast
                # motion of one scene keeps its histogram, so it no longer
                # false-cuts); an overwhelming delta still cuts on its own
                # (fail-safe identical to the hist-off behavior).
                tvd = 0.5 * jnp.abs(hf - ch).sum(axis=-1)  # (D,)
                cut = (
                    (mdelta > step_cfg.scene_cut_thresh)
                    & (tvd[:, None, None, None] > step_cfg.scene_cut_hist)
                ) | (mdelta > 2.5 * step_cfg.scene_cut_thresh)
            else:
                cut = mdelta > step_cfg.scene_cut_thresh
            w = jnp.where(cut, 0.0, w)
            out = (1.0 - w) * fr + w * cf
            return (out, hf), out

        (last, _), outs = jax.lax.scan(
            scan_fn, (prev, h_prev), (yt, h_all, gaps, valids)
        )
        y = jnp.moveaxis(outs, 0, 1).reshape(y.shape)
        new_carry = {
            "frame": jnp.clip(jnp.round(last * 255.0), 0, 255).astype(
                jnp.uint8
            ),
            "valid": jnp.ones((n_shards,), jnp.float32),
        }
    else:
        new_carry = carry

    if step_cfg.yuv420_out:
        from video_restore_tpu.ops.color import rgb_to_yuv420_planar

        return (
            rgb_to_yuv420_planar(
                jnp.clip(y, 0.0, 1.0), dither=step_cfg.dither
            ),
            new_carry,
        )
    from video_restore_tpu.ops.color import quantize_u8

    return quantize_u8(y, dither=step_cfg.dither), new_carry


class ShardedUpscaler:
    """Compiled, mesh-sharded restoration step for one resolution bucket."""

    def __init__(
        self,
        model: ModelHandle,
        grid: TileGrid,
        cfg: RestoreConfig,
        mesh: Optional[Mesh] = None,
        yuv420_out: bool = False,
    ):
        self.mesh = mesh if mesh is not None else frame_mesh(cfg.num_devices)
        self.n_devices = self.mesh.devices.size
        self.grid = grid
        self.scale = grid.scale
        self.step_cfg = dataclasses.replace(
            StepConfig.from_config(cfg), yuv420_out=yuv420_out
        )
        self.yuv420_out = yuv420_out
        self.shard_mode = getattr(cfg, "shard_mode", "frames")
        self._cfg_frames_per_batch = max(
            getattr(cfg, "frames_per_batch", 0), 1
        )
        # int8 selects the W8A8 stripe body; inter-kernel activations
        # (and every non-body stage) stay bf16
        self.compute_dtype = (
            jnp.float32 if cfg.precision == "fp32" else jnp.bfloat16
        )
        axis = self.mesh.axis_names[0]

        self._repl = NamedSharding(self.mesh, P())
        self._shard0 = NamedSharding(self.mesh, P(axis))
        prepared_params, model_apply = model.prepared(
            self.compute_dtype,
            precision="int8" if cfg.precision == "int8" else "bf16",
        )
        self.params = jax.device_put(prepared_params, self._repl)

        if self.shard_mode == "tiles":
            # spatial parallelism: all devices cooperate on each frame's
            # tile batch; frames stream through one (or a few) at a time.
            # Temporal EMA then runs fully sequentially (n_shards=1) —
            # exactly the single-stream semantics.
            frame_shard, carry_shard = self._repl, self._repl
            tile_sharding = self._shard0
            n_shards = 1
            self._batch = 1
        else:
            frame_shard, carry_shard = self._shard0, self._shard0
            tile_sharding = None
            n_shards = self.n_devices
            self._batch = self.n_devices

        fn = partial(
            restore_step,
            model_apply=model_apply,
            grid=grid,
            step_cfg=self.step_cfg,
            compute_dtype=self.compute_dtype,
            n_shards=n_shards,
            tile_sharding=tile_sharding,
        )
        carry_shardings = {"frame": carry_shard, "valid": carry_shard}
        self._step = jax.jit(
            fn,
            in_shardings=(self._repl, frame_shard, carry_shardings),
            out_shardings=(frame_shard, carry_shardings),
            donate_argnums=(2,),
        )
        self._frame_shard = frame_shard
        self._carry_shard = carry_shard
        self._n_carry_shards = n_shards
        self._carry = None

    @property
    def frames_per_batch(self) -> int:
        return self._batch

    def reset_temporal(self) -> None:
        self._carry = None

    def _init_carry(self) -> dict:
        hs = self.grid.height * self.scale
        ws = self.grid.width * self.scale
        z = {
            "frame": jnp.zeros((self._n_carry_shards, hs, ws, 3), jnp.uint8),
            "valid": jnp.zeros((self._n_carry_shards,), jnp.float32),
        }
        return jax.device_put(z, self._carry_shard)

    def process_batch(self, frames_u8: np.ndarray) -> jax.Array:
        """frames_u8: (B, H, W, 3) uint8, B divisible by frames_per_batch.
        Returns a device array (B, H*s, W*s, 3) uint8 (async — call
        np.asarray to fetch); dispatch returns immediately so the host can
        overlap decode/encode with TPU compute."""
        b = frames_u8.shape[0]
        if b % self._batch:
            raise ValueError(
                f"batch {b} not divisible by {self._batch} "
                f"({self.shard_mode}-sharded over {self.n_devices} devices)"
            )
        if self._carry is None:
            self._carry = self._init_carry()
        if isinstance(frames_u8, jax.Array) and (
            frames_u8.sharding == self._frame_shard
        ):
            x = frames_u8  # already staged on device (benchmarks)
        else:
            x = jax.device_put(jnp.asarray(frames_u8), self._frame_shard)
        out, self._carry = self._step(self.params, x, self._carry)
        return out

    def stage(self, frames_u8: np.ndarray) -> jax.Array:
        """Pre-place a batch on the mesh (overlap H2D with compute)."""
        return jax.device_put(jnp.asarray(frames_u8), self._frame_shard)

    def warmup(self) -> None:
        """Compile (and run once, on a zero batch) this bucket's step.

        Populates the jit executable cache so the first real batch does
        not pay the multi-minute TPU compile. Thread-safe against other
        buckets warming concurrently — XLA compilation releases the GIL,
        so batch mode warms all distinct resolutions in parallel threads
        (pipeline.runner.VideoRestorer._warmup_buckets)."""
        # match the pipeline's real batch size (frames_per_batch frames
        # per device per call): a different B is a different jit cache
        # key, and a mismatched prewarm compiles a never-used executable
        b = self._batch * self._cfg_frames_per_batch
        x = np.zeros((b, self.grid.height, self.grid.width, 3), np.uint8)
        jax.block_until_ready(self.process_batch(x))
        self.reset_temporal()
