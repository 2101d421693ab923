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
from pathlib import Path

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


def run_config5_batch(full: bool, cpu: bool):
    """Config 5 is the reference's BATCH DIRECTORY mode
    (video_upscaler.py:723-746 + README.md:30): multiple videos, mixed
    resolutions, bucket prewarm, encode + audio passthrough. Earlier
    rounds recorded it as a copy of config 2's device-only number, which
    measured none of that machinery — this drives the REAL
    VideoRestorer.process_batch_dir on a synthetic 2-video directory and
    reports wall-clock throughput + prewarm time. H.265 encode is used
    when an ffmpeg binary exists; otherwise the pure-Python y4m backend
    (this dev image has no ffmpeg — the encoder subprocess cost is then
    excluded, which is the honest label, not a copy of config 2)."""
    import json as _json
    import os
    import shutil
    import tempfile
    import time as _time

    import numpy as np

    from video_restore_tpu.config import RestoreConfig
    from video_restore_tpu.models.zoo import random_model
    from video_restore_tpu.pipeline.runner import VideoRestorer
    from video_restore_tpu.video.y4m import Y4MWriter

    os.environ.setdefault("VRT_ALLOW_RANDOM_WEIGHTS", "1")
    have_ffmpeg = shutil.which("ffmpeg") is not None
    tmp = Path(tempfile.mkdtemp(prefix="vrt_bench5_"))
    indir, outdir = tmp / "in", tmp / "out"
    indir.mkdir()
    rng = np.random.default_rng(0)
    # mixed resolutions -> two compile buckets, the prewarm's whole point
    sizes = [(1080, 1920, 6), (720, 1280, 6)] if full else [
        (120, 160, 2), (96, 160, 2)
    ]
    total_frames = 0
    for i, (h, w, n) in enumerate(sizes):
        with Y4MWriter(str(indir / f"clip{i}.y4m"), w, h, 25) as wr:
            yy, xx = np.mgrid[0:h, 0:w]
            for t in range(n):
                f = np.stack(
                    [xx * 255 // w, yy * 255 // h,
                     np.full((h, w), 30 + 25 * t)], -1
                )
                wr.write(
                    np.clip(
                        f + rng.integers(-9, 9, (h, w, 3)), 0, 255
                    ).astype(np.uint8)
                )
        total_frames += n

    cfg = RestoreConfig(
        model_name="RealESRGAN_x4plus",
        tile_size=512, tile_overlap=32,
        video_codec="h265" if have_ffmpeg else "h264",
        output_format=None if have_ffmpeg else "y4m",
        audio_copy=have_ffmpeg,
        batch_warmup=True,
    )
    model = random_model("RealESRGAN_x4plus", dtype=np.float32)
    r = VideoRestorer(cfg, model=model)
    t0 = _time.time()
    r._warmup_buckets(
        [(v, outdir / v.name) for v in sorted(indir.iterdir())]
    )
    prewarm_s = _time.time() - t0
    t0 = _time.time()
    ok, total = r.process_batch_dir(indir, outdir, show_progress=False)
    wall = _time.time() - t0
    rec = {
        "config": 5, "name": "batch-dir mixed-res",
        "model": "RealESRGAN_x4plus",
        "videos": total, "ok": ok == total, "frames": total_frames,
        "encoder": ("h265+mux" if have_ffmpeg else "y4m (no ffmpeg)"),
        "prewarm_s": round(prewarm_s, 2),
        "wall_fps_first": round(total_frames / wall, 3),
    }
    if not cpu:
        # second pass = steady-state wall (buckets compiled, codecs warm)
        t0 = _time.time()
        ok2, _ = r.process_batch_dir(indir, outdir, show_progress=False)
        rec["ok"] = rec["ok"] and ok2 == total
        rec["wall_fps_steady"] = round(
            total_frames / (_time.time() - t0), 3
        )
    print(_json.dumps(rec), flush=True)
    shutil.rmtree(tmp, ignore_errors=True)


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
        ("batch-dir mixed-res", None, 0, 0, 0, 0, dict()),
    ]
    for i, (name, m, h, w, t, o, kw) in enumerate(suite, 1):
        if args.configs and i not in args.configs:
            continue
        try:
            if i == 5:
                # the real batch-directory path (prewarm + per-video
                # pipeline + encode), not a copy of config 2
                run_config5_batch(f, args.cpu)
                continue
            if args.tile0:
                t = 0
            run_config(i, name, m, h, w, t, o, kw, args.iters)
        except Exception as e:
            print(json.dumps({"config": i, "name": name,
                              "error": str(e)[:200]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
