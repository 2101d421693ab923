"""Benchmark: 1080p -> 4K x4 Real-ESRGAN inference, frames/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference's ~3-6 FPS on one RTX 3090 in
enhanced mode for 1080p->4K; vs_baseline is measured fps/chip over the
4.5 FPS midpoint. Runs the full fused pipeline step (bilateral denoise +
seamless tiled RRDBNet-23 bf16 + CLAHE + unsharp + temporal EMA), i.e. the
same program the production pipeline dispatches, on random weights
(weight values don't affect throughput).
"""

import json
import sys
import time

import numpy as np


def main() -> int:
    import os

    import jax

    # persistent compile cache: first-compile of this program takes minutes
    # on TPU; cached runs start in seconds
    cache = os.environ.get(
        "VRT_XLA_CACHE", os.path.expanduser("~/.cache/video_restore_tpu/xla")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from video_restore_tpu.config import RestoreConfig
    from video_restore_tpu.models.zoo import random_model
    from video_restore_tpu.models.rrdbnet import default_use_stripe
    from video_restore_tpu.ops.tiles import (
        TileGrid,
        auto_full_frame,
        auto_tile_chunk,
    )
    from video_restore_tpu.parallel.dispatch import ShardedUpscaler
    from video_restore_tpu.parallel.mesh import frame_mesh

    h, w = 1080, 1920
    n_dev = len(jax.devices())
    # mirror the production full_frame="auto" rule (pipeline/runner.py):
    # full-frame when the stripe body is active and the frame fits HBM;
    # VRT_BENCH_TILE forces a tile size (0 = full-frame)
    tile_env = os.environ.get("VRT_BENCH_TILE")
    if tile_env is not None:
        tile = int(tile_env)
    elif default_use_stripe() and auto_full_frame(h, w, 4):
        tile = 0
    else:
        tile = 512
    cfg = RestoreConfig(
        model_name="RealESRGAN_x4plus",
        tile_size=tile,
        tile_overlap=32,
        # VRT_PRECISION=int8 A/Bs the W8A8 stripe body through the same
        # production step (models/rrdbnet.py default_precision)
        precision=os.environ.get("VRT_PRECISION", "bf16"),
        enhanced_mode=True,
        denoise=0.5,
        sharpen=0.3,
        color_enhance=True,
        temporal=True,
        audio_copy=False,
    )
    model = random_model(cfg.model_name, dtype=np.float32)
    grid = TileGrid.build(h, w, cfg.tile_size, cfg.tile_overlap, 4)
    chunk = auto_tile_chunk(grid.rows.extract, grid.cols.extract, 4, grid.n_tiles)
    if chunk:
        import dataclasses

        grid = dataclasses.replace(grid, tile_chunk=chunk)

    ups = ShardedUpscaler(model, grid, cfg, frame_mesh())

    rng = np.random.default_rng(0)
    frames = ups.stage(
        rng.integers(0, 256, (n_dev, h, w, 3), dtype=np.uint8)
    )

    # warmup / compile
    out = ups.process_batch(frames)
    np.asarray(out[..., :1, :1])

    # Timing relies on the donated temporal-carry chain: step N consumes
    # step N-1's carry buffer, so steps serialize on device, and the final
    # tiny D2H slice waits for the whole chain. (jax.block_until_ready is
    # unreliable under remote-tunnel transports, and fetching full 8K
    # frames would measure tunnel bandwidth, not chip throughput.)
    n_iters = 4
    t0 = time.time()
    for _ in range(n_iters):
        out = ups.process_batch(frames)
    np.asarray(out[..., :1, :1])
    dt = time.time() - t0

    total_frames = n_iters * n_dev
    fps = total_frames / dt
    fps_per_chip = fps / n_dev
    baseline_fps_single_gpu = 4.5  # README.md:197 midpoint, 1x RTX 3090
    print(
        json.dumps(
            {
                "metric": "1080p->4K x4 RealESRGAN_x4plus enhanced fps/chip",
                "value": round(fps_per_chip, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps_per_chip / baseline_fps_single_gpu, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
