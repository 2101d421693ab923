"""CLI surface and preset-matrix tests (video_upscaler.py:629-762 parity)."""

import pytest

from video_restore_tpu.cli import build_parser, config_from_args
from video_restore_tpu.config import RestoreConfig, apply_quality_preset


@pytest.mark.parametrize(
    "quality,enhanced,expect",
    [
        ("max", True, (12, "veryslow", 512, 64)),
        ("max", False, (12, "veryslow", 1536, 32)),
        ("fast", True, (18, "fast", 1024, 16)),
        ("fast", False, (18, "fast", 1024, 16)),
        ("balanced", True, (15, "slow", 512, 32)),
        ("balanced", False, (15, "slow", 1024, 16)),
    ],
)
def test_quality_preset_matrix(quality, enhanced, expect):
    """Exactly the reference's table (video_upscaler.py:687-701)."""
    assert apply_quality_preset(quality, enhanced) == expect


def test_explicit_flags_override_preset():
    assert apply_quality_preset(
        "max", False, crf=20, preset="fast", tile_size=256, tile_overlap=8
    ) == (20, "fast", 256, 8)


def test_reference_invocations_parse():
    """Every documented reference invocation must parse."""
    p = build_parser()
    for argv in [
        ["in.mp4", "out.mp4"],
        ["in.mp4", "out.mp4", "--quality", "max", "--enhanced"],
        ["in.mp4", "out.mp4", "--model", "RealESRGAN_x4plus_anime_6B"],
        ["in.mp4", "out.mp4", "--tile-size", "1024", "--tile-overlap", "32"],
        ["in.mp4", "out.mp4", "--crf", "12", "--preset", "veryslow"],
        ["in.mp4", "out.mp4", "--no-audio"],
        ["dir", "outdir", "--batch"],
        # advertised-but-unimplemented reference flags (SURVEY.md §2.5)
        ["in.mp4", "out.mp4", "--model", "RealESRGAN_x2plus"],
        ["in.mp4", "out.mp4", "--anime-mode"],
        ["in.mp4", "out.mp4", "--denoise", "0.7", "--sharpen", "0.3"],
        ["in.mp4", "out.mp4", "--no-seamless", "--no-temporal",
         "--no-color-enhance"],
        ["in.mp4", "out.mp4", "--format", "h265"],
    ]:
        args = p.parse_args(argv)
        config_from_args(args)


def test_enhanced_implies_light_denoise():
    """--enhanced turns on the reference's fixed bilateral pre-filter
    (video_upscaler.py:714: light_denoise=enhanced)."""
    p = build_parser()
    cfg = config_from_args(p.parse_args(["a", "b", "--enhanced"]))
    assert cfg.enhanced_mode and cfg.denoise == 0.5
    cfg2 = config_from_args(p.parse_args(["a", "b"]))
    assert not cfg2.enhanced_mode and cfg2.denoise == 0.0


def test_denoise_without_enhanced_still_applies():
    """--denoise/--sharpen alone must not be silently ignored."""
    from video_restore_tpu.parallel.dispatch import StepConfig

    p = build_parser()
    cfg = config_from_args(p.parse_args(["a", "b", "--denoise", "0.7"]))
    sc = StepConfig.from_config(cfg)
    assert sc.denoise == 0.7
    assert not sc.temporal and not sc.color_enhance  # enhanced-only extras


def test_anime_mode_selects_anime_model():
    p = build_parser()
    cfg = config_from_args(p.parse_args(["a", "b", "--anime-mode"]))
    assert cfg.model_name == "RealESRGAN_x4plus_anime_6B"


def test_x2_model_native_scale():
    """The reference hardcodes scale=4 (video_upscaler.py:718), breaking its
    advertised 2x model; here the model's native scale is honoured."""
    cfg = RestoreConfig(model_name="RealESRGAN_x2plus")
    assert cfg.scale == 2 and cfg.outscale == 2.0


def test_invalid_config_rejected():
    with pytest.raises(ValueError):
        RestoreConfig(model_name="nope")
    with pytest.raises(ValueError):
        RestoreConfig(tile_overlap=512, tile_size=512)
    with pytest.raises(ValueError):
        # tile_size=0 ignores the overlap but still rejects negatives
        RestoreConfig(tile_overlap=-1, tile_size=0)
    with pytest.raises(ValueError):
        RestoreConfig(preset="warp9")


def test_gpus_id_list_semantics():
    """--devices keeps count semantics; --gpus carries the reference's
    GPU-id semantics (N ids = N mesh devices, including --gpus 0 = ONE
    device). Parsed through the real argparse surface — a shared dest
    once made `--devices 4` mean one device."""
    from video_restore_tpu.cli import _resolve_devices, build_parser

    p = build_parser()

    def n(argv):
        a = p.parse_args(["i", "o"] + argv)
        return _resolve_devices(
            a.gpus if a.gpus is not None else a.devices
        )

    assert n([]) == 0
    assert n(["--devices", "4"]) == 4
    assert n(["--devices", "0"]) == 0  # 0 = all devices
    assert n(["--gpus", "0"]) == 1  # reference single-id form
    assert n(["--gpus", "0", "1"]) == 2
    assert n(["--gpus", "3"]) == 1  # id value is irrelevant


def test_gpus_overrides_devices_with_warning(caplog):
    """Supplying both --devices and --gpus lets --gpus win but warns
    instead of silently dropping --devices."""
    import logging

    from video_restore_tpu.cli import _pick_device_flag, _resolve_devices
    from video_restore_tpu.cli import build_parser

    p = build_parser()
    a = p.parse_args(["i", "o", "--devices", "4", "--gpus", "0", "1"])
    with caplog.at_level(logging.WARNING, logger="video_restore_tpu"):
        picked = _pick_device_flag(a)
    assert _resolve_devices(picked) == 2  # --gpus wins
    assert any("--gpus wins" in r.message for r in caplog.records)
