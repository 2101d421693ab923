"""Command-line interface.

Preserves the reference CLI surface verbatim (video_upscaler.py:629-762) —
every documented invocation of the reference works here — and adds the
flags its README advertises but its code lacks (SURVEY.md §2.5):
``--anime-mode``, ``--denoise``, ``--sharpen``, ``--no-seamless``,
``--no-temporal``, ``--no-color-enhance``, ``--format``/H.265, the
RealESRGAN_x2plus model, plus TPU-specific ``--devices``/``--precision``
and resilience flags (``--resume``, ``--segment-frames``).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from video_restore_tpu.config import (
    MODEL_NAMES,
    RestoreConfig,
    X264_PRESETS,
    apply_quality_preset,
)
from video_restore_tpu.utils.logging import setup_logging


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="video-restore",
        description="TPU-native AI video upscaler (Real-ESRGAN family)",
        formatter_class=argparse.RawDescriptionHelpFormatter,
        epilog="""
Examples:
  video-restore input.mp4 output.mp4
  video-restore input.mp4 output.mp4 --quality max --enhanced
  video-restore input.mp4 output.mp4 --model RealESRGAN_x4plus_anime_6B
  video-restore input.mp4 output.mp4 --model RealESRGAN_x2plus
  video-restore in_dir/ out_dir/ --batch --quality fast
  video-restore clip.y4m out.y4m --segment-frames 64 --resume

Streaming (y4m over stdin/stdout, for ffmpeg pipelines):
  ffmpeg -i in.mkv -f yuv4mpegpipe - | video-restore - - | \\
      ffmpeg -i - -c:v libx265 -crf 18 out.mkv
""",
    )
    # positional (video_upscaler.py:649-650)
    p.add_argument("input", help="input video file (or directory with --batch)")
    p.add_argument("output", help="output video file (or directory with --batch)")
    # reference flags (video_upscaler.py:652-682)
    p.add_argument("--model", default="RealESRGAN_x4plus", choices=MODEL_NAMES)
    # separate options: --devices keeps this CLI's COUNT semantics while
    # --gpus carries the reference's GPU-ID-list semantics verbatim
    # (video_upscaler.py:656-657) — a shared argparse dest cannot tell
    # `--devices 4` (4 devices) from `--gpus 4` (one device, id 4)
    p.add_argument(
        "--devices", dest="devices", type=int, default=0,
        help="number of TPU devices to shard frames across (0 = all)",
    )
    p.add_argument(
        "--gpus", dest="gpus", type=int, default=None, nargs="*",
        help="reference-compatible GPU id list (`--gpus 0 1`): N ids = "
             "N mesh devices; which physical chips is the mesh's choice",
    )
    p.add_argument("--quality", default="balanced",
                   choices=["fast", "balanced", "max"])
    p.add_argument("--enhanced", action="store_true",
                   help="enable the enhancement stack (denoise/CLAHE/"
                        "unsharp/temporal)")
    p.add_argument("--tile-size", type=int, default=None,
                   help="model tile size; 0 = no tiling (whole frame in "
                        "one model call — fastest when HBM admits it)")
    p.add_argument("--full-frame", default=None,
                   choices=["auto", "on", "off"],
                   help="auto-upgrade to no-tiling when the frame fits "
                        "HBM (default auto; 'off' always tiles)")
    p.add_argument("--tile-overlap", type=int, default=None)
    p.add_argument("--crf", type=int, default=None)
    p.add_argument("--preset", default=None, choices=list(X264_PRESETS))
    p.add_argument("--no-audio", action="store_true")
    p.add_argument("--batch", action="store_true",
                   help="process a directory of videos")
    p.add_argument("--no-warmup", dest="batch_warmup",
                   action="store_false",
                   help="skip the batch-mode bucket prewarm (by default "
                        "all distinct resolutions are probed and their "
                        "programs compiled in parallel up front)")
    p.add_argument("--multihost", action="store_true",
                   help="join a jax.distributed multi-host runtime and "
                        "shard --batch videos across hosts (coordinator "
                        "from --coordinator or JAX_COORDINATOR_ADDRESS/"
                        "JAX_NUM_PROCESSES/JAX_PROCESS_ID; auto on TPU "
                        "pods)")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="multihost coordinator address")
    # advertised-but-unimplemented reference features (SURVEY.md §2.5)
    p.add_argument("--anime-mode", action="store_true",
                   help="anime-tuned model + post settings (README.md:161)")
    p.add_argument("--denoise", type=float, default=None, metavar="0..1",
                   help="bilateral denoise strength (0.5 = reference's "
                        "fixed 5/25/25 filter)")
    p.add_argument("--sharpen", type=float, default=None, metavar="0..1",
                   help="unsharp-mask strength")
    p.add_argument("--face-model", default="auto",
                   choices=["auto", "gfpgan", "regions"],
                   help="face restorer: GFPGAN v1-clean prior (needs "
                        "downloadable weights) or the region heuristic")
    p.add_argument("--face-enhance", action="store_true",
                   help="detect faces and restore them with the GFPGAN "
                        "v1-clean prior (README.md:3); falls back to a "
                        "region-enhancement heuristic when the GFPGAN "
                        "weights are unavailable")
    p.add_argument("--no-seamless", action="store_true",
                   help="legacy pad-and-crop tiling (RealESRGANer parity)")
    p.add_argument("--no-temporal", action="store_true",
                   help="disable temporal consistency")
    p.add_argument("--no-color-enhance", action="store_true",
                   help="disable CLAHE color correction")
    p.add_argument("--dither", action="store_true",
                   help="ordered-dithered 8-bit quantization of the output "
                        "(breaks up banding on smooth gradients)")
    p.add_argument("--format", dest="vformat", default=None,
                   choices=["h264", "h265", "mpeg4", "rawvideo"],
                   help="output video codec (h265 per README.md:250)")
    p.add_argument("--outscale", type=float, default=0.0,
                   help="final upscale factor (Lanczos-resized from the "
                        "model's native scale)")
    # TPU / framework flags
    p.add_argument(
        "--precision", default="bf16", choices=["bf16", "fp32", "int8"],
        help="model compute precision; int8 runs the RRDB body as W8A8 "
        "MXU dots (opt-in speed-for-quality trade, see docs/KNOBS.md)",
    )
    p.add_argument("--shard-mode", default="frames",
                   choices=["frames", "tiles"],
                   help="frames: shard the frame batch across devices "
                        "(throughput); tiles: all devices cooperate on one "
                        "frame (latency + exact sequential temporal)")
    p.add_argument("--frames-per-batch", type=int, default=0,
                   help="frames per device per step (0 = 1)")
    p.add_argument("--resume", action="store_true",
                   help="resume a partially-encoded .y4m output")
    p.add_argument("--segment-frames", type=int, default=0,
                   help="checkpoint interval in frames (enables resume)")
    p.add_argument("--cpu", action="store_true",
                   help="run on host CPU (no TPU; config-1 parity mode)")
    p.add_argument("--models-dir", default="models")
    p.add_argument("--profile", default="", metavar="DIR",
                   help="capture a jax.profiler device trace to DIR")
    p.add_argument("--verbose", "-v", action="store_true")
    p.add_argument("--log-json", default=None, metavar="FILE",
                   help="also write JSON-lines logs to FILE")
    return p


def _pick_device_flag(args):
    """--gpus (reference id-list semantics) wins over --devices, but
    supplying both is almost certainly a misconfiguration — warn instead
    of silently dropping --devices."""
    import logging

    gpus = getattr(args, "gpus", None)
    if gpus is None:
        return args.devices
    if args.devices:
        logging.getLogger("video_restore_tpu").warning(
            "both --devices %d and --gpus %s given: --gpus wins "
            "(--devices ignored)",
            args.devices, " ".join(map(str, gpus)),
        )
    return gpus


def _resolve_devices(devices) -> int:
    """Normalize ``--devices/--gpus`` to a device count.

    Accepts the reference's id-list form ``--gpus 0 1``
    (video_upscaler.py:656-657) with the reference's semantics: the list
    names GPU ids, so N ids mean "use N mesh devices" — including the
    single-id form (``--gpus 0`` = one device, exactly as the reference
    reads it; it is NOT this CLI's ``--devices 0`` = all-devices count).
    The ids themselves are meaningless on a TPU mesh, where placement
    belongs to the sharding, so we warn and use len().
    """
    if isinstance(devices, int):
        return devices
    if not devices:  # `--gpus` with no operands
        return 0
    import logging

    logging.getLogger("video_restore_tpu").warning(
        "--gpus %s: interpreting the reference's GPU-id list as %d mesh "
        "device(s); physical placement is chosen by the TPU mesh "
        "(use --devices N for count semantics)",
        " ".join(map(str, devices)), len(devices),
    )
    return len(devices)


def config_from_args(args: argparse.Namespace) -> RestoreConfig:
    # --anime-mode implies the enhanced stack; the preset matrix and the
    # implied denoise must see the same effective flag or anime runs get an
    # inconsistent half-enhanced configuration (ADVICE r1).
    enhanced = args.enhanced or args.anime_mode
    crf, preset, tile, overlap = apply_quality_preset(
        args.quality, enhanced,
        crf=args.crf, preset=args.preset,
        tile_size=args.tile_size, tile_overlap=args.tile_overlap,
    )
    # --enhanced implies the reference's light_denoise (video_upscaler.py:714)
    denoise = args.denoise if args.denoise is not None else (
        0.5 if enhanced else 0.0
    )
    sharpen = args.sharpen if args.sharpen is not None else 0.0
    return RestoreConfig(
        model_name=args.model,
        tile_size=tile,
        tile_overlap=overlap,
        full_frame=(
            args.full_frame if args.full_frame is not None
            # an explicit --tile-size is a direct instruction: honour it
            else ("off" if args.tile_size is not None else "auto")
        ),
        seamless=not args.no_seamless,
        legacy_tiling=args.no_seamless,
        precision=args.precision,
        enhanced_mode=enhanced,
        denoise=denoise,
        sharpen=sharpen,
        temporal=not args.no_temporal,
        color_enhance=not args.no_color_enhance,
        dither=args.dither,
        anime_mode=args.anime_mode,
        face_enhance=args.face_enhance,
        face_model=args.face_model,
        video_codec=args.vformat or "h264",
        crf=crf,
        preset=preset,
        audio_copy=not args.no_audio,
        num_devices=_resolve_devices(_pick_device_flag(args)),
        shard_mode=args.shard_mode,
        frames_per_batch=args.frames_per_batch,
        batch_warmup=args.batch_warmup,
        resume=args.resume,
        segment_frames=args.segment_frames,
        models_dir=args.models_dir,
        verbose=args.verbose,
        trace_dir=args.profile,
        outscale=args.outscale,
    )


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    log = setup_logging(args.verbose, args.log_json)
    import jax

    if args.cpu:
        # must happen before the first backend use; overrides any
        # platform plugin the environment forces
        jax.config.update("jax_platforms", "cpu")
    # persistent XLA compilation cache: first compile of a (model, tile,
    # resolution) bucket can take minutes on TPU; later runs start
    # instantly. TPU-only: CPU AOT artifacts are machine-feature-pinned
    # and can SIGILL when the host fleet is heterogeneous.
    import os as _os

    cache = _os.environ.get(
        "VRT_XLA_CACHE", _os.path.expanduser("~/.cache/video_restore_tpu/xla")
    )
    if cache and not args.cpu:
        try:
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
    # typo protection for the measured-knob surface (docs/KNOBS.md): a
    # misspelled VRT_* would otherwise silently no-op
    from video_restore_tpu.utils.knobs import warn_unknown_knobs

    warn_unknown_knobs()
    if args.multihost:
        from video_restore_tpu.parallel.multihost import init_multihost

        try:
            init_multihost(args.coordinator)
        except Exception as e:
            log.error("multihost init failed: %s", e)
            return 1
    try:
        config = config_from_args(args)
    except ValueError as e:
        log.error("%s", e)
        return 1

    from video_restore_tpu.video.y4m import is_pipe

    if not is_pipe(args.input) and not Path(args.input).exists():
        log.error("input not found: %s", args.input)
        return 1

    from video_restore_tpu.pipeline.runner import VideoRestorer

    try:
        restorer = VideoRestorer(config)
    except (RuntimeError, FileNotFoundError) as e:  # e.g. weights unavailable
        log.error("%s", e)
        return 1
    try:
        if args.batch:
            ok, total = restorer.process_batch_dir(args.input, args.output)
            log.info("batch complete: %d/%d succeeded", ok, total)
            return 0 if ok == total and total > 0 else 1
        return 0 if restorer.process_video(args.input, args.output) else 1
    except KeyboardInterrupt:  # video_upscaler.py:754-756
        log.warning("interrupted")
        return 1


if __name__ == "__main__":
    sys.exit(main())
