"""Native framecodec: build, parity with the numpy path, and speed sanity."""

import numpy as np
import pytest

from video_restore_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("no native toolchain available")
    return lib


def test_native_builds(lib):
    assert lib.framecodec_abi_version() == 1


def test_rgb_yuv420_parity_with_numpy(lib, rng):
    import video_restore_tpu.video.y4m as y4m

    frame = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    ny, nu, nv = native.rgb_to_yuv(frame, "420")

    # numpy float reference (force-fallback path)
    import unittest.mock as mock

    with mock.patch.object(native, "rgb_to_yuv", return_value=None):
        ry, ru, rv = y4m.rgb_to_yuv_planes(frame, "420")
    assert ny.shape == ry.shape and nu.shape == ru.shape
    assert np.abs(ny.astype(int) - ry.astype(int)).max() <= 2
    assert np.abs(nu.astype(int) - ru.astype(int)).max() <= 2
    assert np.abs(nv.astype(int) - rv.astype(int)).max() <= 2


def test_yuv_rgb_roundtrip_native(lib, rng):
    frame = rng.integers(16, 240, (48, 64, 3), dtype=np.uint8)
    y, u, v = native.rgb_to_yuv(frame, "444")
    back = native.yuv_to_rgb(y, u, v)
    assert np.abs(back.astype(int) - frame.astype(int)).max() <= 4


def test_y4m_uses_native_transparently(lib, tmp_path, tiny_frames):
    """The y4m backend should produce valid output through the native path."""
    from video_restore_tpu.video.y4m import Y4MReader, Y4MWriter

    p = tmp_path / "n.y4m"
    with Y4MWriter(p, 64, 48, 25) as w:
        for f in tiny_frames[:3]:
            w.write(f)
    with Y4MReader(p) as r:
        out = list(r)
    assert len(out) == 3
    err = np.abs(out[0].astype(int) - tiny_frames[0].astype(int)).mean()
    assert err < 6, err


def test_odd_dims_fall_back(lib, rng):
    # 420 with odd dims is unsupported natively -> None (caller falls back)
    frame = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    assert native.rgb_to_yuv(frame, "420") is None
