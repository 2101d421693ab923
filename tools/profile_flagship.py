"""Capture a jax.profiler device trace of the flagship enhanced step
(bench.py's exact program) into /tmp/tr; summarize with
tools/analyze_trace.py. Run from the repo root:

    PYTHONPATH=/root/.axon_site:. python tools/profile_flagship.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import os, time, json
import numpy as np
import jax
cache = os.path.expanduser("~/.cache/video_restore_tpu/xla")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from video_restore_tpu.config import RestoreConfig
from video_restore_tpu.models.zoo import random_model
from video_restore_tpu.ops.tiles import TileGrid, auto_tile_chunk
from video_restore_tpu.parallel.dispatch import ShardedUpscaler
from video_restore_tpu.parallel.mesh import frame_mesh
import dataclasses

h, w = 1080, 1920
n_dev = len(jax.devices())
cfg = RestoreConfig(model_name="RealESRGAN_x4plus",
    tile_size=int(os.environ.get("VRT_BENCH_TILE", "512")), tile_overlap=32,
    precision="bf16", enhanced_mode=True, denoise=0.5, sharpen=0.3,
    color_enhance=True, temporal=True, audio_copy=False)
model = random_model(cfg.model_name, dtype=np.float32)
grid = TileGrid.build(h, w, cfg.tile_size, cfg.tile_overlap, 4)
chunk = auto_tile_chunk(grid.rows.extract, grid.cols.extract, 4, grid.n_tiles)
if chunk:
    grid = dataclasses.replace(grid, tile_chunk=chunk)
print("grid:", grid.n_tiles, "tiles", grid.rows.extract, "x", grid.cols.extract, "chunk", grid.tile_chunk)
ups = ShardedUpscaler(model, grid, cfg, frame_mesh())
rng = np.random.default_rng(0)
frames = ups.stage(rng.integers(0, 256, (n_dev, h, w, 3), dtype=np.uint8))
out = ups.process_batch(frames)
np.asarray(out[..., :1, :1])
with jax.profiler.trace("/tmp/tr"):
    for _ in range(2):
        out = ups.process_batch(frames)
    np.asarray(out[..., :1, :1])
print("traced")
