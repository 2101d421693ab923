#!/usr/bin/env python
"""Quick-start: generate a degraded clip, restore it, report quality.

The reference README points at a quick_start.py that does not exist
(SURVEY.md §2.5); this is the real one. Runs end-to-end with zero external
dependencies (no ffmpeg, no downloaded weights — uses the synthetic source
clip and, if no weights are cached, random weights with a warning).

    python quick_start.py [--cpu]
"""

import argparse
import os
import sys
import tempfile
from pathlib import Path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="run on host CPU")
    ap.add_argument("--model", default="RealESRGAN_x4plus_anime_6B")
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    os.environ.setdefault("VRT_ALLOW_RANDOM_WEIGHTS", "1")

    from video_restore_tpu.metrics import compare_videos
    from video_restore_tpu.video.fixtures import create_test_videos

    work = Path(tempfile.mkdtemp(prefix="vrt_quickstart_"))
    print(f"workspace: {work}")

    print("1/3 generating a degraded test clip (synthetic source)...")
    [clip] = create_test_videos(
        None, work, presets=["blurry_noisy"], clip_frames=args.frames
    )
    print(f"    {clip}")

    print("2/3 restoring...")
    from video_restore_tpu.cli import main as cli_main

    out = work / "restored.y4m"
    rc = cli_main([str(clip), str(out), "--model", args.model,
                   "--tile-size", "192", "--quality", "fast", "--enhanced"]
                  + (["--cpu"] if args.cpu else []))
    if rc != 0:
        print("restore failed", file=sys.stderr)
        return rc

    print("3/3 done.")
    print(f"    input:  {clip} ({clip.stat().st_size / 1e6:.1f} MB)")
    print(f"    output: {out} ({out.stat().st_size / 1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
