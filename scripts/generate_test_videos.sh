#!/usr/bin/env bash
# Generate the 13-preset degraded test-clip suite.
# (The reference test_videos/README.md:9 references this script but never
# ships it — SURVEY.md §2.5.)
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m video_restore_tpu.video.fixtures --out-dir test_videos/degraded "$@"
