"""Face detection + restoration (GFPGAN prior, with a region fallback).

The reference README advertises GFPGAN face enhancement (README.md:3,
requirements.txt:11) but never imports it (SURVEY.md §2.5). This module
provides the full path:

- detect faces on the LR frame (YuNet DNN detector with 5-point
  landmarks when available, Haar cascade fallback; host-side);
- **learned path** (:func:`make_gfpgan_runner` +
  :func:`restore_faces_learned`): crop each face, similarity-align to
  the canonical FFHQ 5-point template when landmarks exist, run the
  GFPGAN v1-clean prior (models/gfpgan.py, pure JAX, jitted batch of
  512px crops), inverse-warp and paste back feathered;
- **heuristic fallback** (:func:`enhance_face_regions`): when GFPGAN
  weights are unavailable (e.g. zero-egress), apply a stronger
  enhancement to each upscaled face region (extra denoise + adaptive
  sharpening) — honest and artifact-free, but not generative.

Paste-back uses a feathered (cosine-ramp) mask so region edges are
invisible in both paths.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np


@dataclasses.dataclass(frozen=True)
class FaceBox:
    x: int
    y: int
    w: int
    h: int
    # optional 5-point landmarks ((x, y) right eye, left eye, nose tip,
    # right mouth corner, left mouth corner) in the same coordinate frame
    # as the box — provided by the YuNet detector, None otherwise
    landmarks: "tuple | None" = None

    def scaled(self, s: float) -> "FaceBox":
        lm = None
        if self.landmarks is not None:
            lm = tuple((px * s, py * s) for px, py in self.landmarks)
        return FaceBox(
            int(self.x * s), int(self.y * s), int(self.w * s),
            int(self.h * s), lm,
        )

    def expanded(self, frac: float, width: int, height: int) -> "FaceBox":
        dx, dy = int(self.w * frac), int(self.h * frac)
        x0 = max(self.x - dx, 0)
        y0 = max(self.y - dy, 0)
        x1 = min(self.x + self.w + dx, width)
        y1 = min(self.y + self.h + dy, height)
        return FaceBox(x0, y0, x1 - x0, y1 - y0)


_detector = None  # ("cascade"|"yunet"|"skin", handle)


def _init_detector():
    """Pick the best available detector:

    1. YuNet DNN (OpenCV >= 4.5.4 FaceDetectorYN; needs an .onnx model
       file at $VRT_YUNET_MODEL or models/face_detection_yunet*.onnx) —
       preferred because it returns the 5-point landmarks the GFPGAN
       alignment path needs,
    2. Haar cascade (OpenCV bundles the XML; boxes only),
    3. skin-region heuristic (always available; no learned prior).
    """
    import glob
    import os

    import cv2

    if hasattr(cv2, "FaceDetectorYN_create"):
        cand = [os.environ.get("VRT_YUNET_MODEL", "")]
        cand += glob.glob("models/face_detection_yunet*.onnx")
        for p in cand:
            if p and os.path.exists(p):
                return (
                    "yunet",
                    cv2.FaceDetectorYN_create(p, "", (320, 320), 0.7),
                )
    if hasattr(cv2, "CascadeClassifier") and hasattr(cv2, "data"):
        path = os.path.join(
            cv2.data.haarcascades, "haarcascade_frontalface_default.xml"
        )
        if os.path.exists(path):
            return ("cascade", cv2.CascadeClassifier(path))
    return ("skin", None)


def _get_detector():
    global _detector
    if _detector is None:
        _detector = _init_detector()
    return _detector


def _detect_skin_regions(frame_rgb: np.ndarray, min_size: int) -> List[FaceBox]:
    """Heuristic fallback: YCbCr skin segmentation + connected components
    filtered by size/aspect. No learned prior — conservative thresholds."""
    import cv2

    ycc = cv2.cvtColor(frame_rgb, cv2.COLOR_RGB2YCrCb)
    y, cr, cb = ycc[..., 0], ycc[..., 1], ycc[..., 2]
    mask = (
        (y > 60) & (cr > 135) & (cr < 175) & (cb > 85) & (cb < 130)
    ).astype(np.uint8)
    kernel = np.ones((5, 5), np.uint8)
    mask = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, kernel)
    mask = cv2.morphologyEx(mask, cv2.MORPH_OPEN, kernel)
    n, labels, stats, _ = cv2.connectedComponentsWithStats(mask)
    out = []
    for i in range(1, n):
        x, y0, w, h, area = stats[i]
        if w < min_size or h < min_size:
            continue
        if area < 0.35 * w * h:  # sparse blob, not a face
            continue
        aspect = h / max(w, 1)
        if not 0.7 <= aspect <= 2.2:
            continue
        out.append(FaceBox(int(x), int(y0), int(w), int(h)))
    return out


def detect_faces(frame_rgb: np.ndarray, min_size: int = 24) -> List[FaceBox]:
    """Detect faces on an RGB uint8 frame (run on the LR input — cheap)."""
    import cv2

    kind, det = _get_detector()
    if kind == "cascade":
        gray = cv2.cvtColor(frame_rgb, cv2.COLOR_RGB2GRAY)
        gray = cv2.equalizeHist(gray)
        faces = det.detectMultiScale(
            gray, scaleFactor=1.15, minNeighbors=5,
            minSize=(min_size, min_size),
        )
        return [FaceBox(int(x), int(y), int(w), int(h)) for x, y, w, h in faces]
    if kind == "yunet":
        h, w = frame_rgb.shape[:2]
        det.setInputSize((w, h))
        _, faces = det.detect(frame_rgb[..., ::-1])
        if faces is None:
            return []
        # YuNet rows: x, y, w, h, then 5 landmark (x, y) pairs (right
        # eye, left eye, nose tip, right/left mouth corner), then score
        return [
            FaceBox(
                int(f[0]), int(f[1]), int(f[2]), int(f[3]),
                tuple(
                    (float(f[4 + 2 * i]), float(f[5 + 2 * i]))
                    for i in range(5)
                ),
            )
            for f in faces
            if f[2] >= min_size and f[3] >= min_size
        ]
    return _detect_skin_regions(frame_rgb, min_size)


def _feather_mask(h: int, w: int, ramp_frac: float = 0.15) -> np.ndarray:
    """2-D cosine-ramp feather mask in [0, 1]."""
    def ramp(n):
        r = max(int(n * ramp_frac), 1)
        e = 0.5 - 0.5 * np.cos(np.pi * (np.arange(r) + 0.5) / r)
        m = np.ones(n)
        m[:r] = e
        m[n - r:] = e[::-1]
        return m

    return ramp(h)[:, None] * ramp(w)[None, :]


def enhance_face_regions(
    hr_frame: np.ndarray,
    faces_lr: List[FaceBox],
    scale: int,
    strength: float = 0.5,
) -> np.ndarray:
    """Sharpen/denoise each face region of the upscaled frame and feather
    it back in. hr_frame: (H, W, 3) uint8 RGB; faces_lr: boxes in LR
    coordinates."""
    if not faces_lr:
        return hr_frame
    import cv2

    out = hr_frame.copy()
    hh, ww = hr_frame.shape[:2]
    for box in faces_lr:
        b = box.scaled(scale).expanded(0.25, ww, hh)
        if b.w < 8 or b.h < 8:
            continue
        region = hr_frame[b.y : b.y + b.h, b.x : b.x + b.w].astype(np.float32)
        # edge-preserving smooth, then sharpen what remains (skin smooths,
        # eyes/edges crispen)
        smooth = cv2.bilateralFilter(
            region.astype(np.uint8), 7, 30, 30
        ).astype(np.float32)
        blur = cv2.GaussianBlur(smooth, (0, 0), 1.2)
        sharp = smooth + (1.0 + strength) * (smooth - blur)
        enhanced = np.clip(sharp, 0, 255)
        m = _feather_mask(b.h, b.w)[..., None]
        blended = enhanced * m + region * (1.0 - m)
        out[b.y : b.y + b.h, b.x : b.x + b.w] = np.clip(
            blended, 0, 255
        ).astype(np.uint8)
    return out


# ---------------------------------------------------------------------------
# learned face restoration (GFPGAN v1-clean prior)
# ---------------------------------------------------------------------------

# The canonical FFHQ 5-point template at 512px (right eye, left eye, nose
# tip, right mouth corner, left mouth corner) — the standard alignment
# target the upstream GFPGAN tool warps faces to before the prior (public
# facexlib constant).
FFHQ_TEMPLATE_512 = np.array(
    [
        [192.98138, 239.94708],
        [318.90277, 240.1936],
        [256.63416, 314.01935],
        [201.26117, 371.41043],
        [313.08905, 371.15118],
    ],
    np.float32,
)


def align_transform(landmarks: np.ndarray) -> "np.ndarray | None":
    """Similarity transform (2x3) mapping 5 detected landmarks onto the
    canonical FFHQ 512px template, or None if estimation fails."""
    import cv2

    src = np.asarray(landmarks, np.float32).reshape(5, 2)
    m, _ = cv2.estimateAffinePartial2D(
        src, FFHQ_TEMPLATE_512, method=cv2.LMEDS
    )
    if m is None or not np.isfinite(m).all():
        return None
    # degenerate scale (collinear/duplicate landmarks) -> unusable warp
    s = float(np.hypot(m[0, 0], m[0, 1]))
    if not 1e-3 < s < 1e3:
        return None
    return m.astype(np.float32)


def make_gfpgan_runner(models_dir=None, name: str = "GFPGANv1.4"):
    """Load the GFPGAN prior and return a jitted crop-restorer, or None
    if weights are unavailable (callers fall back to the region
    heuristic). The runner maps (N, 512, 512, 3) float32 [0,1] crops to
    restored crops; N is bucketed to limit recompiles."""
    import jax
    import jax.numpy as jnp

    from video_restore_tpu.models.gfpgan import apply_gfpgan, load_gfpgan

    try:
        params, spec = load_gfpgan(models_dir, name)
    except Exception:
        return None

    jitted = jax.jit(lambda p, x: apply_gfpgan(p, x, spec))

    def run(crops: np.ndarray) -> np.ndarray:
        n = crops.shape[0]
        bucket = 1 << max(0, (n - 1).bit_length())  # 1,2,4,8…
        padded = np.zeros((bucket,) + crops.shape[1:], np.float32)
        padded[:n] = crops
        out = np.asarray(jitted(params, jnp.asarray(padded)))
        return out[:n]

    return run


def restore_faces_learned(
    hr_frame: np.ndarray,
    faces_lr: List[FaceBox],
    scale: int,
    runner,
    strength: float = 0.5,
) -> np.ndarray:
    """Restore each detected face with the GFPGAN prior and feather it
    back. hr_frame: (H, W, 3) uint8 RGB; faces_lr: LR-coordinate boxes;
    ``strength`` blends restored vs original inside the crop (GFPGAN's
    `weight`): 0 = untouched, 1 = fully restored.

    Faces with 5-point landmarks (YuNet) are similarity-warped to the
    canonical FFHQ template before the prior and inverse-warped on paste
    — the upstream GFPGAN behaviour, which preserves identity on tilted
    faces. Boxes without landmarks use the loose square-crop fallback."""
    if not faces_lr or runner is None:
        return hr_frame
    import cv2

    hh, ww = hr_frame.shape[:2]
    aligned = []  # (M 2x3 HR->template) per face
    boxes = []  # (x0, y0, side) loose-square fallback
    # two crop lists: aligned and fallback faces can interleave in
    # detection order, but the batch is split positionally below — a
    # single list mispaired crops with warp matrices/boxes when both
    # kinds were present in one frame
    crops_aligned = []
    crops_boxes = []
    for box in faces_lr:
        b = box.scaled(scale)
        m = (
            align_transform(np.asarray(b.landmarks, np.float32))
            if b.landmarks is not None
            else None
        )
        if m is not None:
            crop = cv2.warpAffine(
                hr_frame, m, (512, 512), flags=cv2.INTER_LINEAR,
                borderMode=cv2.BORDER_CONSTANT,
                borderValue=(135, 133, 132),
            )
            aligned.append(m)
            crops_aligned.append(crop.astype(np.float32) / 255.0)
            continue
        # square crop with margin, GFPGAN-style loose alignment
        side = int(max(b.w, b.h) * 1.6)
        cx, cy = b.x + b.w // 2, b.y + b.h // 2
        x0 = max(0, min(cx - side // 2, ww - side))
        y0 = max(0, min(cy - side // 2, hh - side))
        side = min(side, ww - x0, hh - y0)
        if side >= 32:
            boxes.append((x0, y0, side))
            crops_boxes.append(
                cv2.resize(
                    hr_frame[y0 : y0 + side, x0 : x0 + side],
                    (512, 512), interpolation=cv2.INTER_LINEAR,
                ).astype(np.float32) / 255.0
            )
    crops = crops_aligned + crops_boxes
    if not crops:
        return hr_frame

    restored = runner(np.stack(crops))
    rest_aligned = restored[: len(aligned)]
    rest_boxes = restored[len(aligned):]

    out = hr_frame.astype(np.float32)
    feather512 = _feather_mask(512, 512).astype(np.float32)
    for m, rest in zip(aligned, rest_aligned):
        inv = cv2.invertAffineTransform(m)
        back = cv2.warpAffine(
            np.clip(rest, 0.0, 1.0) * 255.0, inv, (ww, hh),
            flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT,
            borderValue=0,
        )
        mask = cv2.warpAffine(
            feather512, inv, (ww, hh), flags=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT, borderValue=0,
        )[..., None] * strength
        out = back * mask + out * (1.0 - mask)
    out = np.clip(out, 0, 255).astype(np.uint8)

    for (x0, y0, s), rest in zip(boxes, rest_boxes):
        back = cv2.resize(
            (np.clip(rest, 0.0, 1.0) * 255.0).astype(np.uint8), (s, s),
            interpolation=cv2.INTER_LINEAR,
        ).astype(np.float32)
        region = out[y0 : y0 + s, x0 : x0 + s].astype(np.float32)
        m = _feather_mask(s, s)[..., None] * strength
        blended = back * m + region * (1.0 - m)
        out[y0 : y0 + s, x0 : x0 + s] = np.clip(blended, 0, 255).astype(
            np.uint8
        )
    return out
