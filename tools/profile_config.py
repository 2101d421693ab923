"""Capture a jax.profiler device trace of one bench_suite config's
production program (same construction as bench_suite.run_config, tile0
by default). Summarize with tools/analyze_trace.py.

    PYTHONPATH=/root/.axon_site:. python tools/profile_config.py 4
"""

import dataclasses
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax

cache = os.path.expanduser("~/.cache/video_restore_tpu/xla")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from video_restore_tpu.config import RestoreConfig
from video_restore_tpu.models.zoo import MODEL_ZOO, random_model
from video_restore_tpu.ops.tiles import TileGrid, auto_tile_chunk
from video_restore_tpu.parallel.dispatch import ShardedUpscaler
from video_restore_tpu.parallel.mesh import frame_mesh

# (model, h, w, tile, overlap, cfg) mirroring bench_suite's --full rows
SUITE = {
    1: ("RealESRGAN_x2plus", 1080, 1920, 0, 16, dict(precision="bf16")),
    2: ("RealESRGAN_x4plus", 1080, 1920, 0, 32, dict()),
    3: ("RealESRGAN_x4plus", 720, 1280, 0, 64,
        dict(enhanced_mode=True, denoise=0.5, sharpen=0.3,
             color_enhance=True, temporal=True)),
    4: ("RealESRGAN_x4_v3", 1080, 1920, 0, 16, dict(enhanced_mode=True)),
}

idx = int(sys.argv[1]) if len(sys.argv) > 1 else 4
model_name, h, w, tile, overlap, kw = SUITE[idx]
tile = int(os.environ.get("VRT_BENCH_TILE", str(tile)))
scale = MODEL_ZOO[model_name].spec.scale
cfg = RestoreConfig(
    model_name=model_name, tile_size=tile, tile_overlap=overlap,
    audio_copy=False, **kw,
)
model = random_model(model_name, dtype=np.float32)
grid = TileGrid.build(h, w, tile, overlap, scale)
chunk = auto_tile_chunk(
    grid.rows.extract, grid.cols.extract, scale, grid.n_tiles
)
if chunk:
    grid = dataclasses.replace(grid, tile_chunk=chunk)
print("config", idx, "grid:", grid.n_tiles, "tiles",
      grid.rows.extract, "x", grid.cols.extract, "chunk", grid.tile_chunk)
ups = ShardedUpscaler(model, grid, cfg, frame_mesh())
rng = np.random.default_rng(0)
frames = ups.stage(
    rng.integers(0, 256, (ups.frames_per_batch, h, w, 3), dtype=np.uint8)
)
out = ups.process_batch(frames)
np.asarray(out[..., :1, :1])
with jax.profiler.trace("/tmp/tr"):
    for _ in range(2):
        out = ups.process_batch(frames)
    np.asarray(out[..., :1, :1])
print("traced")
