# Developer entry points (the reference README documents `make setup` /
# `make check` but ships no Makefile — SURVEY.md §2.5).

PY ?= python

.PHONY: setup check test bench parity test-videos native clean

setup:
	$(PY) -m pip install -e .

check: test

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

# golden-weight parity: converts + runs every zoo model (and GFPGAN) and
# checks PSNR/SSIM vs the torch cross-implementation. With released .pth
# files in models/ this certifies REAL-weight parity (the BASELINE.md
# north-star bar); without them it self-checks on schema-exact synthetic
# checkpoints against the committed goldens in tests/goldens/.
parity:
	$(PY) tools/golden_parity.py --models-dir models

# generate the degraded test-clip suite (13 presets)
test-videos:
	$(PY) -m video_restore_tpu.video.fixtures --out-dir test_videos/degraded

# force-build the native framecodec library
native:
	$(PY) -c "from video_restore_tpu.utils import native; \
	          lib = native.load(); \
	          print('native framecodec:', 'ok' if lib else 'unavailable')"

clean:
	rm -rf build dist *.egg-info $(HOME)/.cache/video_restore_tpu
