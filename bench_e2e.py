"""End-to-end wall-clock benchmark: decode -> restore -> encode, measured
the way the reference measures itself (video_upscaler.py:369-428 times the
whole process_video call, not just inference).

Synthesizes a 1080p clip, runs the full production pipeline
(VideoRestorer.process_video) on it, and prints ONE JSON line with the
wall-clock fps plus the per-stage breakdown (decode-wait / dispatch /
fetch / encode) from the runner's StageTimer.

Dev-harness caveat (printed in the JSON as "transport"): through the axon
tunnel, host<->device bandwidth is ~MB/s, so `fetch` (D2H of the upscaled
frames) dominates wall-clock here in a way it does not on a real TPU host
(PCIe/gRPC locally: GB/s). `device_fps` — frames over (wall - fetch-wait
overlap) — is reported alongside as the transport-independent number;
`fps` is the honest end-to-end figure for THIS host.

Usage: python bench_e2e.py [--frames N] [--height H] [--width W] [--mp4]
"""

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--mp4", action="store_true",
                    help="encode through ffmpeg/libx265 instead of y4m")
    ap.add_argument("--model", default="RealESRGAN_x4plus")
    args = ap.parse_args(argv)

    os.environ.setdefault("VRT_ALLOW_RANDOM_WEIGHTS", "1")
    import jax

    cache = os.environ.get(
        "VRT_XLA_CACHE", os.path.expanduser("~/.cache/video_restore_tpu/xla")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from video_restore_tpu.config import RestoreConfig
    from video_restore_tpu.pipeline.runner import VideoRestorer
    from video_restore_tpu.video.fixtures import synth_source_clip
    from video_restore_tpu.video.y4m import Y4MWriter

    tmp = Path(tempfile.mkdtemp(prefix="vrt_e2e_"))
    src = tmp / "src.y4m"
    dst = tmp / ("out.mp4" if args.mp4 else "out.y4m")
    wr = Y4MWriter(src, args.width, args.height, fps=24.0)
    for f in synth_source_clip(args.frames, args.height, args.width):
        wr.write(f)
    wr.close()

    cfg = RestoreConfig(
        model_name=args.model,
        enhanced_mode=True,
        denoise=0.5,
        sharpen=0.3,
        color_enhance=True,
        temporal=True,
        audio_copy=False,
    )
    restorer = VideoRestorer(cfg)

    # warmup pass: pay XLA compilation outside the timed run (the
    # persistent cache makes this fast on repeat invocations)
    restorer.process_video(src, tmp / "warm.y4m", show_progress=False)

    t0 = time.time()
    ok = restorer.process_video(src, dst, show_progress=False)
    wall = time.time() - t0
    if not ok:
        print(json.dumps({"error": "pipeline failed"}))
        return 1

    stats = restorer.last_stats
    fetch = stats.stages.get("fetch", 0.0)
    fps = args.frames / wall
    device_fps = args.frames / max(wall - fetch, 1e-9)
    print(json.dumps({
        "metric": f"{args.width}x{args.height} e2e decode->encode "
                  f"{args.model} enhanced wall-clock",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "device_fps": round(device_fps, 3),
        "stages_s": {k: round(v, 2) for k, v in stats.stages.items()},
        "container": dst.suffix,
        "transport": "axon-tunnel (D2H ~MB/s; fetch dominates here, "
                     "not on a real TPU host)",
    }))
    for p in tmp.iterdir():
        p.unlink()
    tmp.rmdir()
    return 0


if __name__ == "__main__":
    sys.exit(main())
