"""Host-side video I/O: probing, decode, encode, audio mux, test fixtures.

Replaces the reference's FFmpeg-pipe plumbing (SURVEY.md C4, C6, C13, C15;
/root/reference/video_upscaler.py:165-275, 507-570, 604-627) with a backend
abstraction:

- ``ffmpeg``: subprocess rawvideo pipes + libx264/libx265 + audio mux — the
  full-featured backend, used when the ffmpeg binary exists.
- ``opencv``: cv2 VideoCapture/VideoWriter (bundled codecs, no audio).
- ``y4m``:   pure-Python YUV4MPEG2 reader/writer (no external deps; exact,
  great for tests and lossless intermediates).
- ``npz``:   trivial lossless numpy container for unit tests.

All frames cross the API as (H, W, 3) uint8 **RGB** (the reference pipes
BGR24 because OpenCV/torch expect BGR; RGB is the natural layout here).
"""

from video_restore_tpu.video.io_base import VideoInfo, VideoReader, VideoWriter
from video_restore_tpu.video.backends import (
    open_reader,
    open_writer,
    probe,
    ffmpeg_available,
)
from video_restore_tpu.video.mux import copy_audio

__all__ = [
    "VideoInfo",
    "VideoReader",
    "VideoWriter",
    "open_reader",
    "open_writer",
    "probe",
    "ffmpeg_available",
    "copy_audio",
]
