"""tiles-vs-frames shard-mode A/B (VERDICT r3 item 6; claim at
cli.py --shard-mode help: tiles = all devices cooperate on one frame for
LATENCY, frames = throughput).

Two measurements:

1. --cpu-mesh: 8 virtual CPU devices, tiny shapes — single-frame wall
   LATENCY of tiles mode (8 devices split the tile axis) vs frames mode
   (1 of 8 devices does the whole frame). This is the ratio the latency
   claim stands on; CPU wall-clock ratios are indicative, the sharding
   programs are the real ones.
2. default (real chip): production-ish shape, shard_mode=tiles vs frames
   on ONE device — measures the tile-axis sharding machinery's overhead
   when it cannot help (should be ~neutral; records that tiles mode
   costs nothing when n_devices=1).

Usage: python tools/bench_shard_mode.py [--cpu-mesh]
"""

import argparse
import dataclasses
import json
import os
import time

import numpy as np


def bench_mode(shard_mode, model_name, h, w, tile, overlap, n_frames,
               iters, devices):
    import jax

    from video_restore_tpu.config import RestoreConfig
    from video_restore_tpu.models.zoo import MODEL_ZOO, random_model
    from video_restore_tpu.ops.tiles import TileGrid, auto_tile_chunk
    from video_restore_tpu.parallel.dispatch import ShardedUpscaler
    from video_restore_tpu.parallel.mesh import frame_mesh

    scale = MODEL_ZOO[model_name].spec.scale
    cfg = RestoreConfig(
        model_name=model_name, tile_size=tile, tile_overlap=overlap,
        audio_copy=False, shard_mode=shard_mode, num_devices=devices,
    )
    model = random_model(model_name, dtype=np.float32)
    grid = TileGrid.build(h, w, tile, overlap, scale)
    if shard_mode == "frames":
        chunk = auto_tile_chunk(
            grid.rows.extract, grid.cols.extract, scale, grid.n_tiles
        )
        if chunk:
            grid = dataclasses.replace(grid, tile_chunk=chunk)
    mesh = frame_mesh(cfg.num_devices)
    ups = ShardedUpscaler(model, grid, cfg, mesh)
    n = max(n_frames, ups.frames_per_batch)
    rng = np.random.default_rng(0)
    frames = ups.stage(rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8))
    out = ups.process_batch(frames)
    _ = np.asarray(out[..., :1, :1])  # compile + settle
    t0 = time.time()
    for _ in range(iters):
        out = ups.process_batch(frames)
    _ = np.asarray(out[..., :1, :1])
    dt = (time.time() - t0) / iters
    return {
        "shard_mode": shard_mode, "devices": int(mesh.devices.size),
        "frames_per_call": n, "wall_s_per_call": round(dt, 4),
        "fps": round(n / dt, 3),
        "latency_ms_per_frame": round(dt / n * 1e3, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-mesh", action="store_true",
                    help="8 virtual CPU devices, tiny shapes (latency AB)")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()
    os.environ.setdefault("VRT_ALLOW_RANDOM_WEIGHTS", "1")

    import jax

    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
        # single frame, 8 devices: tiles mode splits the 16-tile grid
        # across devices; frames mode leaves 7 devices idle
        for mode, dev in (("tiles", 8), ("frames", 8)):
            r = bench_mode(
                mode, "RealESRGAN_x4plus_anime_6B", 96, 128, 32, 8,
                1, args.iters, dev,
            )
            print(json.dumps(r), flush=True)
    else:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/video_restore_tpu/xla"),
        )
        for mode in ("frames", "tiles"):
            r = bench_mode(
                mode, "RealESRGAN_x4plus", 1080, 1920, 512, 32,
                1, args.iters, 1,
            )
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
