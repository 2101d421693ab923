"""Benchmark suite over the 5 BASELINE.json configs.

Unlike bench.py (one JSON line for the driver), this prints one line per
config. Sizes are chosen so the suite completes in bounded time; pass
--full for production resolutions.

    python bench_suite.py [--full] [--cpu] [--configs 1 2 ...]
"""

import argparse
import dataclasses
import json
import sys
import time

import numpy as np


def run_config(idx, name, model_name, h, w, tile, overlap, cfg_kwargs, iters):
    import jax

    from video_restore_tpu.config import RestoreConfig
    from video_restore_tpu.models.zoo import MODEL_ZOO, random_model
    from video_restore_tpu.ops.tiles import TileGrid, auto_tile_chunk
    from video_restore_tpu.parallel.dispatch import ShardedUpscaler
    from video_restore_tpu.parallel.mesh import frame_mesh

    scale = MODEL_ZOO[model_name].spec.scale
    cfg = RestoreConfig(
        model_name=model_name, tile_size=tile, tile_overlap=overlap,
        audio_copy=False, **cfg_kwargs,
    )
    model = random_model(model_name, dtype=np.float32)
    grid = TileGrid.build(h, w, tile, overlap, scale)
    chunk = auto_tile_chunk(
        grid.rows.extract, grid.cols.extract, scale, grid.n_tiles
    )
    if chunk:
        grid = dataclasses.replace(grid, tile_chunk=chunk)
    mesh = frame_mesh(cfg.num_devices)
    ups = ShardedUpscaler(model, grid, cfg, mesh)
    n = ups.frames_per_batch
    rng = np.random.default_rng(0)
    frames = ups.stage(rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8))
    out = ups.process_batch(frames)
    _ = np.asarray(out[..., :1, :1])
    t0 = time.time()
    for _ in range(iters):
        out = ups.process_batch(frames)
    # Sync: temporal configs serialize on the donated carry chain; for
    # non-temporal configs the iterations are independent programs, but a
    # single TPU core executes enqueued programs in issue order, so this
    # 1-pixel fetch of the LAST output still waits for the whole loop.
    # (block_until_ready is unreliable through the tunnel transport.)
    _ = np.asarray(out[..., :1, :1])
    dt = (time.time() - t0) / iters
    fps = n / dt
    print(json.dumps({
        "config": idx, "name": name, "model": model_name,
        "input": f"{w}x{h}", "tile": grid.tile_shape,
        "fps": round(fps, 3),
        "fps_per_chip": round(fps / mesh.devices.size, 3),
        "devices": int(mesh.devices.size),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="production resolutions (slow)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--configs", type=int, nargs="*", default=None)
    ap.add_argument("--tile0", action="store_true",
                    help="run the selected configs full-frame (tile=0)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/vrt_xla"
    )

    f = args.full
    # (name, model, h, w, tile, overlap, cfg)   — BASELINE.json configs
    suite = [
        ("x2plus fast tile256", "RealESRGAN_x2plus",
         360 if not f else 1080, 640 if not f else 1920, 256, 16,
         dict(precision="fp32" if args.cpu else "bf16")),
        ("x4plus balanced seamless", "RealESRGAN_x4plus",
         360 if not f else 1080, 640 if not f else 1920, 512, 32,
         dict()),
        ("enhanced max full-post", "RealESRGAN_x4plus",
         360 if not f else 720, 640 if not f else 1280, 512, 64,
         dict(enhanced_mode=True, denoise=0.5, sharpen=0.3,
              color_enhance=True, temporal=True)),
        ("x4_v3 anime-mode", "RealESRGAN_x4_v3",
         360 if not f else 1080, 640 if not f else 1920, 512, 16,
         dict(enhanced_mode=True)),
        ("batch-mode frame-sharded", "RealESRGAN_x4plus",
         360 if not f else 1080, 640 if not f else 1920, 512, 32,
         dict()),
    ]
    for i, (name, m, h, w, t, o, kw) in enumerate(suite, 1):
        if args.configs and i not in args.configs:
            continue
        if args.tile0:
            t = 0
        try:
            run_config(i, name, m, h, w, t, o, kw, args.iters)
        except Exception as e:
            print(json.dumps({"config": i, "name": name,
                              "error": str(e)[:200]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
