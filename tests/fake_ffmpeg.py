#!/usr/bin/env python
"""A minimal fake ffmpeg/ffprobe for backend tests (no real binary here).

Installed into PATH as `ffmpeg` and `ffprobe` symlinks by the test
fixture. Speaks just enough of the CLI surface the backend uses:

  ffprobe -v error -print_format json -show_streams -show_format FILE
  ffmpeg -hide_banner -hwaccels
  ffmpeg -loglevel error [-hwaccel X] -i IN -f rawvideo -pix_fmt rgb24 -
  ffmpeg -y -loglevel error -f rawvideo ... -i - ... OUT
  ffmpeg -y ... -i OUT -i SRC -map ... -c:v copy -c:a copy TMP

Video payloads are .npz containers (frames+fps), so the fake can decode
and encode losslessly.
"""

import json
import os
import sys

import numpy as np


def probe(path):
    d = np.load(path)
    frames = d["frames"]
    fps = float(d["fps"]) if "fps" in d else 25.0
    out = {
        "streams": [
            {
                "codec_type": "video",
                "width": int(frames.shape[2]),
                "height": int(frames.shape[1]),
                "r_frame_rate": f"{int(round(fps * 1000))}/1000",
                "nb_frames": str(frames.shape[0]),
                "codec_name": "fakecodec",
                "pix_fmt": "yuv420p",
            }
        ],
        "format": {"duration": str(frames.shape[0] / fps)},
    }
    if "audio" in d:
        out["streams"].append({"codec_type": "audio"})
    print(json.dumps(out))


def _i420_to_rgb(planar, w, h):
    """Studio-range BT.601 planar I420 -> RGB (numpy, standalone — the
    fake has no repo on sys.path)."""
    y = planar[:h].astype(np.float32)
    u = planar[h : h + h // 4].reshape(h // 2, w // 2).astype(np.float32)
    v = planar[h + h // 4 :].reshape(h // 2, w // 2).astype(np.float32)
    u = np.repeat(np.repeat(u, 2, 0), 2, 1)
    v = np.repeat(np.repeat(v, 2, 0), 2, 1)
    yf = (y - 16.0) / 219.0
    uf = (u - 128.0) / 224.0
    vf = (v - 128.0) / 224.0
    kr, kb = 0.299, 0.114
    r = yf + vf * 2.0 * (1.0 - kr)
    b = yf + uf * 2.0 * (1.0 - kb)
    g = (yf - kr * r - kb * b) / (1.0 - kr - kb)
    rgb = np.stack([r, g, b], -1)
    return np.clip(np.round(rgb * 255.0), 0, 255).astype(np.uint8)


def main(argv):
    prog = os.path.basename(argv[0])
    args = argv[1:]
    if prog == "ffprobe" or "-show_streams" in args:
        probe(args[-1])
        return 0
    if "-hwaccels" in args:
        print("Hardware acceleration methods:\nvaapi\n")
        return 0
    if "-f" in args and "rawvideo" in args and args[-1] == "-":
        # decode: npz -> raw rgb24 on stdout
        src = args[args.index("-i") + 1]
        d = np.load(src)
        for f in d["frames"]:
            sys.stdout.buffer.write(np.ascontiguousarray(f).tobytes())
        return 0
    if "-i" in args and args[args.index("-i") + 1] == "-":
        # encode: rawvideo on stdin -> npz at last arg. The first -pix_fmt
        # is the stdin format (rgb24 or planar yuv420p, like real ffmpeg).
        s = args[args.index("-s") + 1]
        w, h = (int(x) for x in s.split("x"))
        fps = float(args[args.index("-r") + 1])
        pix = args[args.index("-pix_fmt") + 1]
        raw = sys.stdin.buffer.read()
        if pix == "yuv420p":
            fb = w * h * 3 // 2
            n = len(raw) // fb
            planar = np.frombuffer(raw[: n * fb], np.uint8).reshape(
                n, h * 3 // 2, w
            )
            frames = np.stack([_i420_to_rgb(p, w, h) for p in planar])
        else:
            n = len(raw) // (w * h * 3)
            frames = np.frombuffer(raw[: n * w * h * 3], np.uint8).reshape(
                n, h, w, 3
            )
        with open(args[-1], "wb") as fh:  # exact path (savez appends .npz)
            np.savez(fh, frames=frames, fps=fps)
        return 0
    if "-f" in args and "concat" in args:
        # concat demuxer: -f concat -safe 0 -i LIST -c copy OUT
        lst = args[args.index("-i") + 1]
        files = [
            line.strip()[6:-1]
            for line in open(lst)
            if line.startswith("file ")
        ]
        frames = np.concatenate([np.load(f)["frames"] for f in files])
        fps = float(np.load(files[0])["fps"])
        with open(args[-1], "wb") as fh:
            np.savez(fh, frames=frames, fps=fps)
        return 0
    if "-c:v" in args and "copy" in args:
        # mux: copy video of input0, mark audio from input1 if present
        i1 = args.index("-i")
        vid = args[i1 + 1]
        i2 = args.index("-i", i1 + 1)
        src = args[i2 + 1]
        out = args[-1]
        d = dict(np.load(vid))
        sd = np.load(src)
        if "audio" in sd:
            d["audio"] = sd["audio"]
        else:
            print("no audio stream", file=sys.stderr)
            return 1
        with open(out, "wb") as fh:
            np.savez(fh, **d)
        return 0
    print(f"fake ffmpeg: unhandled args {args}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main(sys.argv))
