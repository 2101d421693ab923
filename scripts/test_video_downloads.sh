#!/usr/bin/env bash
# Fetch the Blender open-movie test clips (Big Buck Bunny, Elephants Dream)
# used by the reference's manual test recipes. The reference README.md:80
# references this script but never ships it (SURVEY.md §2.5).
# Requires network egress; in sealed environments use the synthetic source
# (scripts/generate_test_videos.sh needs no downloads).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p test_videos
fetch() {
  local url="$1" dest="$2"
  if [ -s "$dest" ]; then echo "✓ $dest (cached)"; return; fi
  echo "downloading $dest ..."
  if command -v curl >/dev/null; then
    curl -L --fail -o "$dest.part" "$url"
  else
    python -c "import urllib.request,sys; urllib.request.urlretrieve(sys.argv[1], sys.argv[2])" "$url" "$dest.part"
  fi
  mv "$dest.part" "$dest"
}
fetch "https://download.blender.org/peach/bigbuckbunny_movies/BigBuckBunny_640x360.m4v" \
      "test_videos/BigBuckBunny.mp4"
fetch "https://archive.org/download/ElephantsDream/ed_hd_512kb.mp4" \
      "test_videos/ElephantsDream.mp4"
echo "done."
