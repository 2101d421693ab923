"""FFmpeg subprocess backend: probe, rawvideo decode pipe, encode pipe.

The full-featured backend, used when an ``ffmpeg`` binary is on PATH.
Re-implements the reference's plumbing:

- probe with the 4-level frame-count fallback (video_upscaler.py:165-213):
  stream nb_frames -> format nb_frames -> duration*fps -> -count_frames.
- decode: ``ffmpeg -i IN -f rawvideo -pix_fmt rgb24 -`` fixed-size chunk
  reads (video_upscaler.py:215-259; rgb24 instead of bgr24 — RGB is this
  framework's interchange format).
- encode: stdin rawvideo pipe -> libx264/libx265 with crf/preset/yuv420p/
  +faststart (video_upscaler.py:514-532), extended with the H.265 support
  the reference README advertises (README.md:30,250) but never implements.
- hardware decode accel detection (video_upscaler.py:261-275), probing for
  TPU-host-relevant accels rather than cuda/nvdec.
"""

from __future__ import annotations

import json
import shutil
import subprocess
from pathlib import Path
from typing import Iterator, List, Optional, Union

import numpy as np

from video_restore_tpu.video.io_base import VideoInfo, VideoReader, VideoWriter


def ffmpeg_path() -> Optional[str]:
    return shutil.which("ffmpeg")


def ffprobe_path() -> Optional[str]:
    return shutil.which("ffprobe")


def detect_hw_accel() -> Optional[str]:
    """Parse ``ffmpeg -hwaccels`` for a host decode accelerator
    (the reference checks for cuda/nvdec at video_upscaler.py:261-275;
    on a TPU host the relevant ones are VAAPI/QSV)."""
    exe = ffmpeg_path()
    if not exe:
        return None
    try:
        out = subprocess.run(
            [exe, "-hide_banner", "-hwaccels"],
            capture_output=True, text=True, timeout=10,
        ).stdout.lower()
    except Exception:
        return None
    for accel in ("vaapi", "qsv"):
        if accel in out:
            return accel
    return None


def probe_ffmpeg(path: Union[str, Path]) -> VideoInfo:
    """ffprobe JSON probe with the reference's frame-count fallback chain."""
    exe = ffprobe_path()
    if not exe:
        raise RuntimeError("ffprobe not available")
    out = subprocess.run(
        [
            exe, "-v", "error", "-print_format", "json",
            "-show_streams", "-show_format", str(path),
        ],
        capture_output=True, text=True, timeout=30,
    )
    data = json.loads(out.stdout or "{}")
    streams = data.get("streams", [])
    vstream = next((s for s in streams if s.get("codec_type") == "video"), None)
    if vstream is None:
        raise ValueError(f"no video stream in {path}")
    has_audio = any(s.get("codec_type") == "audio" for s in streams)

    # fps from r_frame_rate fraction (video_upscaler.py:172-177)
    num, _, den = (vstream.get("r_frame_rate") or "25/1").partition("/")
    fps = float(num) / float(den or 1) if float(den or 1) else 25.0

    # frame count fallbacks (video_upscaler.py:180-203)
    frames = int(vstream.get("nb_frames") or 0)
    if not frames:
        frames = int(data.get("format", {}).get("nb_frames") or 0)
    if not frames:
        duration = float(
            vstream.get("duration")
            or data.get("format", {}).get("duration")
            or 0.0
        )
        if duration:
            frames = int(duration * fps)
    if not frames:
        counted = subprocess.run(
            [
                exe, "-v", "error", "-count_frames", "-select_streams", "v:0",
                "-show_entries", "stream=nb_read_frames",
                "-print_format", "json", str(path),
            ],
            capture_output=True, text=True, timeout=300,
        )
        try:
            cdata = json.loads(counted.stdout or "{}")
            frames = int(cdata["streams"][0].get("nb_read_frames") or 0)
        except Exception:
            frames = 0

    return VideoInfo(
        width=int(vstream["width"]),
        height=int(vstream["height"]),
        fps=fps,
        frames=frames,
        codec=vstream.get("codec_name", ""),
        pix_fmt=vstream.get("pix_fmt", ""),
        has_audio=has_audio,
    )


class FFmpegReader(VideoReader):
    """rawvideo rgb24 pipe decoder (video_upscaler.py:215-259)."""

    def __init__(self, path: Union[str, Path], hw_accel: Optional[str] = "auto"):
        self.path = str(path)
        self.info = probe_ffmpeg(path)
        cmd: List[str] = [ffmpeg_path(), "-loglevel", "error"]
        accel = detect_hw_accel() if hw_accel == "auto" else hw_accel
        if accel:
            cmd += ["-hwaccel", accel]
        cmd += ["-i", self.path, "-f", "rawvideo", "-pix_fmt", "rgb24", "-"]
        self._proc = subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            bufsize=10**8,
        )

    def __iter__(self) -> Iterator[np.ndarray]:
        w, h = self.info.width, self.info.height
        frame_bytes = w * h * 3
        try:
            while True:
                buf = self._proc.stdout.read(frame_bytes)
                if len(buf) < frame_bytes:
                    break
                yield np.frombuffer(buf, np.uint8).reshape(h, w, 3)
        finally:
            self.close()

    def close(self) -> None:
        if self._proc.poll() is None:
            self._proc.terminate()
            try:
                self._proc.wait(timeout=5)
            except subprocess.TimeoutExpired:
                self._proc.kill()
        if self._proc.returncode not in (0, None, -15):
            err = self._proc.stderr.read().decode(errors="replace")[-2000:]
            if err:
                raise RuntimeError(f"ffmpeg decode failed: {err}")


_CODEC_ARGS = {
    "h264": ["-vcodec", "libx264"],
    "h265": ["-vcodec", "libx265", "-tag:v", "hvc1"],
    "mpeg4": ["-vcodec", "mpeg4"],
    "rawvideo": ["-vcodec", "rawvideo"],
}


class FFmpegWriter(VideoWriter):
    """rawvideo stdin pipe -> x264/x265 encoder (video_upscaler.py:514-532)."""

    def __init__(
        self,
        path: Union[str, Path],
        width: int,
        height: int,
        fps: float,
        codec: str = "h264",
        crf: int = 15,
        preset: str = "slow",
        pix_fmt: str = "rgb24",
    ):
        self.path = str(path)
        self._pix_fmt = pix_fmt  # rawvideo input format on stdin
        cmd = [
            ffmpeg_path(), "-y", "-loglevel", "error",
            "-f", "rawvideo", "-pix_fmt", pix_fmt,
            "-s", f"{width}x{height}", "-r", f"{fps}",
            "-i", "-", "-an",
            *_CODEC_ARGS.get(codec, _CODEC_ARGS["h264"]),
            "-crf", str(crf), "-preset", preset,
            "-pix_fmt", "yuv420p",
        ]
        if str(path).endswith(".mp4"):
            cmd += ["-movflags", "+faststart"]
        cmd += [self.path]
        self._proc = subprocess.Popen(
            cmd, stdin=subprocess.PIPE, stderr=subprocess.PIPE,
            bufsize=10**8,
        )
        self._count = 0

    def write(self, frame: np.ndarray) -> None:
        if self._pix_fmt != "rgb24":
            raise ValueError(
                f"writer expects {self._pix_fmt} input; use write_yuv420"
            )
        self._proc.stdin.write(np.ascontiguousarray(frame).tobytes())
        self._count += 1

    def write_yuv420(self, planar: np.ndarray) -> None:
        """Planar I420 frame ((H*3//2, W) uint8, device-converted) straight
        onto the encoder pipe — requires pix_fmt='yuv420p' at construction."""
        if self._pix_fmt != "yuv420p":
            raise ValueError("writer was not opened with pix_fmt='yuv420p'")
        self._proc.stdin.write(np.ascontiguousarray(planar).tobytes())
        self._count += 1

    @property
    def frames_written(self) -> int:
        return self._count

    def close(self) -> None:
        if self._proc.stdin and not self._proc.stdin.closed:
            self._proc.stdin.close()
        ret = self._proc.wait()
        if ret != 0:
            err = self._proc.stderr.read().decode(errors="replace")[-2000:]
            raise RuntimeError(f"ffmpeg encode failed ({ret}): {err}")
