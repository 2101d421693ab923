"""Face-region enhancement tests (cv2 Haar cascade based)."""

import numpy as np
import pytest

from video_restore_tpu.ops.faces import (
    FaceBox,
    detect_faces,
    enhance_face_regions,
)

cv2 = pytest.importorskip("cv2")


def _synthetic_face(size=200):
    """Draw a crude frontal face the Haar cascade can find."""
    img = np.full((size, size, 3), 180, np.uint8)
    c = size // 2
    cv2.ellipse(img, (c, c), (size // 3, int(size // 2.2)), 0, 0, 360,
                (210, 190, 170), -1)
    eye_y = c - size // 10
    for ex in (c - size // 8, c + size // 8):
        cv2.circle(img, (ex, eye_y), size // 18, (40, 40, 40), -1)
    cv2.ellipse(img, (c, c + size // 6), (size // 10, size // 20), 0, 0, 180,
                (80, 50, 50), 3)
    cv2.line(img, (c, c - size // 30), (c, c + size // 12), (120, 90, 80), 2)
    return img


def test_detect_synthetic_face():
    img = _synthetic_face()
    faces = detect_faces(img)
    # Haar cascades are finicky on synthetic imagery; accept detection OR
    # gracefully-empty, but the call must not crash and boxes must be valid
    for f in faces:
        assert f.w > 0 and f.h > 0
        assert 0 <= f.x < img.shape[1] and 0 <= f.y < img.shape[0]


def test_enhance_regions_changes_only_faces(rng):
    hr = (rng.random((120, 160, 3)) * 255).astype(np.uint8)
    box = FaceBox(10, 10, 20, 20)  # LR coords; scale 2 -> 20..60 px region
    out = enhance_face_regions(hr, [box], scale=2, strength=0.8)
    assert out.shape == hr.shape
    region = slice(20, 60 + 10)  # expanded box
    outside = out[100:, 120:]
    np.testing.assert_array_equal(outside, hr[100:, 120:])
    assert (out[20:60, 20:60] != hr[20:60, 20:60]).any()


def test_enhance_no_faces_is_identity(rng):
    hr = (rng.random((50, 50, 3)) * 255).astype(np.uint8)
    out = enhance_face_regions(hr, [], scale=4)
    np.testing.assert_array_equal(out, hr)


def test_facebox_geometry():
    b = FaceBox(10, 20, 30, 40)
    s = b.scaled(2.0)
    assert (s.x, s.y, s.w, s.h) == (20, 40, 60, 80)
    e = b.expanded(0.5, width=100, height=100)
    assert e.x <= b.x and e.y <= b.y
    assert e.x + e.w <= 100 and e.y + e.h <= 100


def test_pipeline_with_face_enhance(tmp_path, tiny_frames):
    from video_restore_tpu.config import RestoreConfig
    from video_restore_tpu.models.srvgg import SRVGGSpec, init_srvgg
    from video_restore_tpu.models.zoo import ModelHandle
    from video_restore_tpu.pipeline.runner import VideoRestorer
    from video_restore_tpu.video import open_writer, probe
    import jax

    spec = SRVGGSpec(num_feat=8, num_conv=2, scale=2)
    model = ModelHandle("tiny", spec, init_srvgg(jax.random.PRNGKey(0), spec))
    src = tmp_path / "in.npz"
    with open_writer(src, 64, 48, 25) as w:
        for f in tiny_frames[:4]:
            w.write(f)
    cfg = RestoreConfig(
        model_name="RealESRGAN_x4_v3", tile_size=16, tile_overlap=4,
        precision="fp32", audio_copy=False, face_enhance=True,
    )
    r = VideoRestorer(cfg, model=model)
    dst = tmp_path / "out.npz"
    assert r.process_video(src, dst, show_progress=False)
    assert probe(dst).frames == 4


def test_restore_faces_learned_crop_paste():
    """Learned-path crop/paste machinery with a stub restorer: only the
    feathered face regions change, and strength=0 is a no-op."""
    import numpy as np

    from video_restore_tpu.ops.faces import FaceBox, restore_faces_learned

    frame = np.full((256, 256, 3), 100, np.uint8)
    boxes = [FaceBox(20, 24, 32, 32)]

    def runner(crops):
        assert crops.shape[1:] == (512, 512, 3)
        assert crops.dtype == np.float32
        return np.ones_like(crops)  # restore to pure white

    out = restore_faces_learned(frame, boxes, scale=2, runner=runner,
                                strength=1.0)
    assert out.shape == frame.shape
    # face centre (LR box scaled 2x -> centred near (72, 80)) brightened
    assert out[80, 72].mean() > 200
    # far corner untouched
    assert (out[250, 250] == 100).all()

    same = restore_faces_learned(frame, boxes, scale=2, runner=runner,
                                 strength=0.0)
    assert (same == frame).all()

    # no boxes / no runner -> identity
    assert restore_faces_learned(frame, [], 2, runner) is frame
    assert restore_faces_learned(frame, boxes, 2, None) is frame


def test_align_transform_recovers_similarity():
    """Landmarks produced by a known similarity transform of the FFHQ
    template must map back onto the template (identity round-trip)."""
    import numpy as np

    from video_restore_tpu.ops.faces import FFHQ_TEMPLATE_512, align_transform

    theta = np.deg2rad(25.0)
    s = 0.35
    rot = s * np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    t = np.array([41.0, -13.0])
    landmarks = FFHQ_TEMPLATE_512 @ rot.T + t  # face tilted 25deg in frame

    m = align_transform(landmarks.astype(np.float32))
    assert m is not None
    mapped = landmarks @ m[:, :2].T + m[:, 2]
    np.testing.assert_allclose(mapped, FFHQ_TEMPLATE_512, atol=0.1)

    # degenerate landmarks (all identical) are rejected, not propagated
    assert align_transform(np.full((5, 2), 7.0, np.float32)) is None


def test_restore_faces_learned_aligned_path():
    """A tilted face with landmarks takes the warp-align path: the prior
    output is inverse-warped onto the face, and pixels far from the face
    stay untouched."""
    import numpy as np

    from video_restore_tpu.ops.faces import (
        FFHQ_TEMPLATE_512,
        FaceBox,
        restore_faces_learned,
    )

    frame = np.full((512, 512, 3), 100, np.uint8)
    # synthetic tilted face occupying the middle of the frame: landmarks =
    # FFHQ template rotated 20deg about the frame centre, shrunk 0.5x
    theta = np.deg2rad(20.0)
    rot = 0.5 * np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    centre = np.array([256.0, 256.0])
    lm_hr = (FFHQ_TEMPLATE_512 - 256.0) @ rot.T + centre
    # landmarks are carried in LR coordinates (scale=2 here)
    lm_lr = tuple((x / 2.0, y / 2.0) for x, y in lm_hr)
    box = FaceBox(90, 90, 76, 76, landmarks=lm_lr)

    def runner(crops):
        assert crops.shape == (1, 512, 512, 3)
        return np.ones_like(crops)  # restore to pure white

    out = restore_faces_learned(frame, [box], scale=2, runner=runner,
                                strength=1.0)
    # the warped-back prior output covers the landmark area
    nose = lm_hr[2].astype(int)
    assert out[nose[1], nose[0]].mean() > 200
    # frame corner (outside the inverse-warped 512 crop) untouched
    assert (out[4, 4] == 100).all()

    # identity restorer + align path round-trips to ~the original frame
    out2 = restore_faces_learned(
        frame, [box], scale=2,
        runner=lambda c: c, strength=1.0,
    )
    diff = np.abs(out2.astype(int) - frame.astype(int))
    assert diff.max() <= 2  # bilinear warp round-trip tolerance


def test_restore_faces_learned_mixed_pairing():
    """Interleaved fallback + aligned faces: each face gets ITS OWN
    restored crop (regression: crops were batched in detection order but
    split positionally, mispairing the two kinds)."""
    import numpy as np

    from video_restore_tpu.ops.faces import (
        FFHQ_TEMPLATE_512,
        FaceBox,
        restore_faces_learned,
    )

    frame = np.full((512, 1024, 3), 100, np.uint8)
    # face 0: NO landmarks (fallback box crop), left half
    box0 = FaceBox(40, 100, 40, 40)
    # face 1: landmarks (aligned path), right half
    lm_hr = (FFHQ_TEMPLATE_512 - 256.0) * 0.5 + np.array([768.0, 256.0])
    box1 = FaceBox(
        330, 90, 76, 76,
        landmarks=tuple((x / 2.0, y / 2.0) for x, y in lm_hr),
    )

    # restorer paints each crop a distinct color by batch position;
    # with the old positional split, face 1 (aligned, batch slot 0)
    # and face 0 (fallback, slot 1) would swap colors
    def runner(crops):
        out = np.zeros_like(crops)
        out[0, :, :, 0] = 1.0  # slot 0 (the aligned face) -> red
        if len(crops) > 1:
            out[1, :, :, 2] = 1.0  # slot 1 (the fallback face) -> blue
        return out

    out = restore_faces_learned(
        frame, [box0, box1], scale=2, runner=runner, strength=1.0
    )
    # fallback face region (left): blue dominant
    c0 = out[240, 120].astype(int)
    assert c0[2] > 150 and c0[0] < 100, c0
    # aligned face region (right): red dominant
    nose = lm_hr[2].astype(int)
    c1 = out[nose[1], nose[0]].astype(int)
    assert c1[0] > 150 and c1[2] < 100, c1
