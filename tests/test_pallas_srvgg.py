"""Fused SRVGG conv+PReLU stripe kernel (ops/pallas_srvgg.py) vs the XLA
scan path — interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
from unittest import mock

from video_restore_tpu.models.srvgg import (
    SRVGGSpec,
    _apply,
    apply_srvgg,
    init_srvgg,
)


def test_srvgg_stripe_kernel_parity(rng):
    """Direct kernel: 4 chained conv+PReLU == the naive chain, pad-zero
    invariant held."""
    from video_restore_tpu.ops.conv import conv2d, prelu
    from video_restore_tpu.ops.pallas_srvgg import (
        fold_dy,
        srvgg_stripe_padded,
    )
    from video_restore_tpu.ops.pallas_stripe import (
        _PADL,
        pad_stripe_entry,
        unpad_stripe_exit,
    )

    nf, g, bh = 16, 4, 32
    b, h, w = 2, 56, 40
    x = jnp.asarray(rng.random((b, h, w, nf)).astype(np.float32))
    ws = jnp.asarray((rng.random((g, 3, 3, nf, nf)) - 0.5) * 0.3,
                     jnp.float32)
    bs = jnp.asarray(rng.random((g, nf)) * 0.1, jnp.float32)
    al = jnp.asarray(rng.random((g, nf)) * 0.5, jnp.float32)

    ref = x
    for i in range(g):
        ref = prelu(conv2d(ref, ws[i], bs[i]), al[i])

    xp = pad_stripe_entry(x, block_h=bh)
    o = srvgg_stripe_padded(
        xp, fold_dy(ws), bs, al, frame_h=h, frame_w=w, group=g,
        block_h=bh, interpret=True,
    )
    out = unpad_stripe_exit(o, h, w, nf, block_h=bh)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
    op = np.asarray(o)
    assert np.all(op[:, :bh] == 0) and np.all(op[:, bh + h :] == 0)
    assert np.all(op[:, :, : _PADL] == 0)
    assert np.all(op[:, :, _PADL + w :] == 0)
    assert np.all(op[..., nf:] == 0)


def test_srvgg_stripe2d_kernel_parity(rng):
    """2D-blocked SRVGG body kernel (margin-DMA W blocks) == the naive
    chain for all three contraction forms (roll / N-packed / im2col);
    pad-zero invariant held. Exercises frame-edge margin fixups, hp>h
    and wp>w masking."""
    from video_restore_tpu.ops.conv import conv2d, prelu
    from video_restore_tpu.ops.pallas_srvgg import (
        fold_dy,
        srvgg_stripe2d_padded,
    )
    from video_restore_tpu.ops.pallas_stripe import (
        pad_stripe2d_entry,
        unpad_stripe2d_exit,
    )

    nf, g = 16, 4
    b, h, w = 2, 56, 73
    bh, bw = 24, 40  # ns=3 (hp=72>56), nwb=2 (wp=80>73)
    x = jnp.asarray(rng.random((b, h, w, nf)).astype(np.float32))
    ws = jnp.asarray(
        (rng.random((g, 3, 3, nf, nf)) - 0.5) * 0.3, jnp.float32
    )
    bs = jnp.asarray(rng.random((g, nf)) * 0.1, jnp.float32)
    al = jnp.asarray(rng.random((g, nf)) * 0.5, jnp.float32)

    ref = x
    for i in range(g):
        ref = prelu(conv2d(ref, ws[i], bs[i]), al[i])
    ref = np.asarray(ref)

    wd = fold_dy(ws)  # (g, 3, 3nf, nf)
    forms = {
        "roll": wd,
        "pack": jnp.swapaxes(wd, -3, -2).reshape(g, 3 * nf, 3 * nf),
        "im2col": wd.reshape(g, 9 * nf, nf),
    }
    for name, wk in forms.items():
        xp = pad_stripe2d_entry(x, block_h=bh, block_w=bw)
        o = srvgg_stripe2d_padded(
            xp, wk, bs, al, frame_h=h, frame_w=w, group=g,
            block_h=bh, block_w=bw, interpret=True,
        )
        out = unpad_stripe2d_exit(o, h, w, nf, block_h=bh, block_w=bw)
        np.testing.assert_allclose(
            np.asarray(out), ref, rtol=1e-5, atol=1e-5, err_msg=name
        )
        op = np.asarray(o)
        assert np.all(op[:, :bh] == 0) and np.all(op[:, bh + h :] == 0)
        assert np.all(op[:, :, w:] == 0)
        assert np.all(op[..., nf:] == 0)


def test_srvgg_model_stripe2d_path(rng, monkeypatch):
    """Full model with the 2D body forced (VRT_SRVGG_2D=BHxBW, pack
    kform) == the XLA scan path — pins the driver dispatch in
    srvgg._apply."""
    from unittest import mock

    from video_restore_tpu.ops import pallas_srvgg as pk

    monkeypatch.setenv("VRT_SRVGG_2D", "24x40")
    monkeypatch.setenv("VRT_SRVGG_KFORM", "pack")
    monkeypatch.setenv("VRT_SRVGG_GROUP", "4")
    monkeypatch.setenv("VRT_SRVGG_UP", "0")  # XLA upsampler on CPU
    spec = SRVGGSpec(num_feat=16, num_conv=8)
    params = init_srvgg(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.random((1, 48, 73, 3)).astype(np.float32))
    ref = np.asarray(apply_srvgg(params, x, spec, stripe=False))

    orig = pk.srvgg_stripe2d_padded

    def interp(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    with mock.patch.object(pk, "srvgg_stripe2d_padded", interp):
        got = np.asarray(apply_srvgg(params, x, spec, stripe=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_srvgg_model_stripe_path(rng):
    """Full model via the stripe body (interpret) == the XLA scan path."""
    import video_restore_tpu.ops.pallas_srvgg as pk

    spec = SRVGGSpec(num_feat=16, num_conv=16, scale=4)
    params = init_srvgg(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.random((1, 24, 20, 3)).astype(np.float32))
    ref = np.asarray(apply_srvgg(params, x, spec, stripe=False))

    orig = pk.srvgg_stripe_padded
    orig_up = pk.srvgg_up_fused

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    def interp_up(*a, **kw):
        kw["interpret"] = True
        return orig_up(*a, **kw)

    with mock.patch.object(
        pk, "srvgg_stripe_padded", interp
    ), mock.patch.object(pk, "srvgg_up_fused", interp_up):
        out = np.asarray(_apply(params, x, spec.scale, stripe=True))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_srvgg_model_stripe_im2col(rng, monkeypatch):
    """Stripe body in im2col form (VRT_SRVGG_KFORM=im2col) == XLA scan."""
    import video_restore_tpu.ops.pallas_srvgg as pk

    monkeypatch.setenv("VRT_SRVGG_KFORM", "im2col")
    spec = SRVGGSpec(num_feat=16, num_conv=8, scale=2)
    params = init_srvgg(jax.random.PRNGKey(1), spec)
    x = jnp.asarray(rng.random((1, 24, 20, 3)).astype(np.float32))
    ref = np.asarray(apply_srvgg(params, x, spec, stripe=False))

    orig = pk.srvgg_stripe_padded
    orig_up = pk.srvgg_up_fused

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    def interp_up(*a, **kw):
        kw["interpret"] = True
        return orig_up(*a, **kw)

    with mock.patch.object(
        pk, "srvgg_stripe_padded", interp
    ), mock.patch.object(pk, "srvgg_up_fused", interp_up):
        out = np.asarray(_apply(params, x, spec.scale, stripe=True))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_srvgg_up_fused_parity(rng):
    """Fused upsampler (conv_out + pixel_shuffle + nearest skip) == the
    XLA composition, r=4 and r=2, interpret mode."""
    from video_restore_tpu.ops.conv import (
        conv2d,
        pixel_shuffle,
        upsample_nearest,
    )
    from video_restore_tpu.ops.pallas_srvgg import srvgg_up_fused

    nf = 16
    for r, h, w in ((4, 20, 24), (2, 18, 24)):
        feat = jnp.asarray(rng.random((2, h, w, nf)), jnp.float32)
        xin = jnp.asarray(rng.random((2, h, w, 3)), jnp.float32)
        wo = jnp.asarray(
            rng.random((3, 3, nf, 3 * r * r)) * 0.1, jnp.float32
        )
        bo = jnp.asarray(rng.random((3 * r * r,)) * 0.1, jnp.float32)
        ref = pixel_shuffle(conv2d(feat, wo, bo), r) + upsample_nearest(
            xin, r
        )
        got = srvgg_up_fused(
            feat, wo, bo, xin, r=r, block_h=4, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
        )


def _psnr_srvgg(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    rng_ = np.asarray(b).max() - np.asarray(b).min()
    return 10 * np.log10(rng_ * rng_ / max(mse, 1e-20))


def test_srvgg_stripe2d_int8(rng):
    """W8A8 SRVGG 2D body (quantize_prefix_weights on the grouped stack)
    vs the fp32 chain: 4 chained quantized convs on synthetic 0.3-scale
    weights land ~50 dB (real-init full-model parity is 83-92 dB,
    tools/precision_ab.py); pad-zero invariant held. Both the pack and
    roll (per-dx) contraction forms."""
    from video_restore_tpu.ops.conv import conv2d, prelu
    from video_restore_tpu.ops.pallas_srvgg import (
        fold_dy,
        srvgg_stripe2d_padded,
    )
    from video_restore_tpu.ops.pallas_stripe import (
        pad_stripe2d_entry,
        quantize_prefix_weights,
        unpad_stripe2d_exit,
    )

    nf, g = 16, 4
    b, h, w = 1, 56, 73
    bh, bw = 24, 40
    x = jnp.asarray(rng.random((b, h, w, nf)).astype(np.float32))
    ws = jnp.asarray(
        (rng.random((g, 3, 3, nf, nf)) - 0.5) * 0.3, jnp.float32
    )
    bs = jnp.asarray(rng.random((g, nf)) * 0.1, jnp.float32)
    al = jnp.asarray(rng.random((g, nf)) * 0.5, jnp.float32)

    ref = x
    for i in range(g):
        ref = prelu(conv2d(ref, ws[i], bs[i]), al[i])
    ref = np.asarray(ref)

    wd = fold_dy(ws)
    for name, wk in {
        "roll": wd,
        "pack": jnp.swapaxes(wd, -3, -2).reshape(g, 3 * nf, 3 * nf),
    }.items():
        (qw,), (sw,) = quantize_prefix_weights((wk,))
        assert qw.dtype == jnp.int8 and sw.shape == (g, nf)
        xp = pad_stripe2d_entry(x, block_h=bh, block_w=bw)
        o = srvgg_stripe2d_padded(
            xp, qw, bs, al, frame_h=h, frame_w=w, group=g,
            block_h=bh, block_w=bw, sws=sw, interpret=True,
        )
        out = unpad_stripe2d_exit(o, h, w, nf, block_h=bh, block_w=bw)
        assert _psnr_srvgg(out, ref) > 48.0, name
        op = np.asarray(o)
        assert np.all(op[:, :bh] == 0) and np.all(op[:, bh + h :] == 0)
        assert np.all(op[:, :, w:] == 0)


def test_srvgg_model_int8_path(rng, monkeypatch):
    """Full SRVGG model with precision='int8' (2D pack body, interpret)
    stays within a fraction of a dB of the fp32 XLA path."""
    from unittest import mock

    from video_restore_tpu.ops import pallas_srvgg as pk

    monkeypatch.setenv("VRT_SRVGG_2D", "24x40")
    monkeypatch.setenv("VRT_SRVGG_KFORM", "pack")
    monkeypatch.setenv("VRT_SRVGG_GROUP", "4")
    monkeypatch.setenv("VRT_SRVGG_UP", "0")
    spec = SRVGGSpec(num_feat=16, num_conv=8)
    params = init_srvgg(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.random((1, 48, 73, 3)).astype(np.float32))
    ref = np.asarray(apply_srvgg(params, x, spec, stripe=False))

    orig = pk.srvgg_stripe2d_padded

    def interp(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    with mock.patch.object(pk, "srvgg_stripe2d_padded", interp):
        got = np.asarray(
            apply_srvgg(params, x, spec, stripe=True, precision="int8")
        )
    assert got.shape == ref.shape
    assert _psnr_srvgg(got, ref) > 45.0


def test_srvgg_up_fused_raw_parity(rng):
    """Raw-input fused upsampler (consumes the 2D padded body array in
    place) == conv + pixel_shuffle + nearest skip, exactly — including
    the frame edges (rows via the body's zero halo blocks, columns via
    the edge-zeroed taps) and hp>h / wp>w masking."""
    from video_restore_tpu.ops.conv import (
        conv2d,
        pixel_shuffle,
        upsample_nearest,
    )
    from video_restore_tpu.ops.pallas_srvgg import srvgg_up_fused_raw
    from video_restore_tpu.ops.pallas_stripe import pad_stripe2d_entry

    nf, r = 16, 4
    b, h, w = 1, 56, 73
    bh2, bw2 = 24, 40  # hp=72>56, wp=80>73
    feat = jnp.asarray(rng.random((b, h, w, nf)).astype(np.float32))
    x_in = jnp.asarray(rng.random((b, h, w, 3)).astype(np.float32))
    w_out = jnp.asarray(
        (rng.random((3, 3, nf, 3 * r * r)) - 0.5) * 0.3, jnp.float32
    )
    b_out = jnp.asarray(rng.random((3 * r * r)) * 0.1, jnp.float32)

    ref = pixel_shuffle(conv2d(feat, w_out, b_out), r) + upsample_nearest(
        x_in, r
    )
    xp = pad_stripe2d_entry(feat, block_h=bh2, block_w=bw2)
    got = srvgg_up_fused_raw(
        xp, w_out, b_out, x_in, r=r, frame_h=h, frame_w=w,
        block_h2=bh2, block_w2=bw2, interpret=True,
    )
    assert got.shape == (b, r * h, r * w, 3)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_srvgg_model_stripe2d_raw_up(rng, monkeypatch):
    """Full model through the 2D body + the raw-input upsampler branch
    == the XLA scan path."""
    from unittest import mock

    from video_restore_tpu.ops import pallas_srvgg as pk

    monkeypatch.setenv("VRT_SRVGG_2D", "24x40")
    monkeypatch.setenv("VRT_SRVGG_KFORM", "pack")
    monkeypatch.setenv("VRT_SRVGG_GROUP", "4")
    spec = SRVGGSpec(num_feat=16, num_conv=8)
    params = init_srvgg(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.random((1, 48, 73, 3)).astype(np.float32))
    ref = np.asarray(apply_srvgg(params, x, spec, stripe=False))

    orig_b = pk.srvgg_stripe2d_padded
    orig_u = pk.srvgg_up_fused_raw

    def interp_b(*a, **k):
        k.setdefault("interpret", True)
        return orig_b(*a, **k)

    def interp_u(*a, **k):
        k.setdefault("interpret", True)
        return orig_u(*a, **k)

    with mock.patch.object(
        pk, "srvgg_stripe2d_padded", interp_b
    ), mock.patch.object(pk, "srvgg_up_fused_raw", interp_u):
        got = np.asarray(apply_srvgg(params, x, spec, stripe=True))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_srvgg_stripe2d_split_parity(rng):
    """Split edge/interior launches (mask-free interior, alias-chained
    output — the rdb_stripe2d_split pattern) == the single masked call
    == the naive chain, CHAINED twice (the production group scan), for
    the roll and N-packed forms plus the int8 quant path; pad-zero
    invariant held after both applications. Geometry exercises hp>h and
    wp>w masking with a genuine interior (ns=4, nwb=4)."""
    from video_restore_tpu.ops.conv import conv2d, prelu
    from video_restore_tpu.ops.pallas_srvgg import (
        fold_dy,
        srvgg_split_ok,
        srvgg_stripe2d_padded,
        srvgg_stripe2d_split,
    )
    from video_restore_tpu.ops.pallas_stripe import (
        pad_stripe2d_entry,
        quantize_prefix_weights,
        unpad_stripe2d_exit,
    )

    nf, g = 16, 4
    b, h, w = 2, 56, 140
    bh, bw = 16, 40  # ns=4 (hp=64>56), nwb=4 (wp=160>140)
    assert srvgg_split_ok(h, w, g, bh, bw)
    x = jnp.asarray(rng.random((b, h, w, nf)).astype(np.float32))
    ws = jnp.asarray(
        (rng.random((2, g, 3, 3, nf, nf)) - 0.5) * 0.3, jnp.float32
    )
    bs = jnp.asarray(rng.random((2, g, nf)) * 0.1, jnp.float32)
    al = jnp.asarray(rng.random((2, g, nf)) * 0.5, jnp.float32)

    ref = x
    for j in range(2):
        for i in range(g):
            ref = prelu(conv2d(ref, ws[j, i], bs[j, i]), al[j, i])
    ref = np.asarray(ref)

    wd = fold_dy(ws)  # (2, g, 3, 3nf, nf)
    forms = {
        "roll": wd,
        "pack": jnp.swapaxes(wd, -3, -2).reshape(2, g, 3 * nf, 3 * nf),
    }
    for name, wk in forms.items():
        o = pad_stripe2d_entry(x, block_h=bh, block_w=bw)
        for j in range(2):
            o = srvgg_stripe2d_split(
                o, wk[j], bs[j], al[j], frame_h=h, frame_w=w, group=g,
                block_h=bh, block_w=bw, interpret=True,
            )
        out = unpad_stripe2d_exit(o, h, w, nf, block_h=bh, block_w=bw)
        np.testing.assert_allclose(
            np.asarray(out), ref, rtol=1e-5, atol=1e-5, err_msg=name
        )
        op = np.asarray(o)
        assert np.all(op[:, :bh] == 0) and np.all(op[:, bh + h :] == 0)
        assert np.all(op[:, :, w:] == 0)
        assert np.all(op[..., nf:] == 0)
        # split == the single masked call, bitwise (same contraction
        # order per window; only the mask work differs)
        o1 = pad_stripe2d_entry(x, block_h=bh, block_w=bw)
        for j in range(2):
            o1 = srvgg_stripe2d_padded(
                o1, wk[j], bs[j], al[j], frame_h=h, frame_w=w, group=g,
                block_h=bh, block_w=bw, interpret=True,
            )
        np.testing.assert_array_equal(op, np.asarray(o1), err_msg=name)

    # int8 quant leg (pack form): split == single masked quant call
    wk = forms["pack"][0]
    (qw,), (sw,) = quantize_prefix_weights((wk,))
    xp = pad_stripe2d_entry(x, block_h=bh, block_w=bw)
    oq = srvgg_stripe2d_split(
        xp, qw, bs[0], al[0], frame_h=h, frame_w=w, group=g,
        block_h=bh, block_w=bw, sws=sw, interpret=True,
    )
    oq1 = srvgg_stripe2d_padded(
        xp, qw, bs[0], al[0], frame_h=h, frame_w=w, group=g,
        block_h=bh, block_w=bw, sws=sw, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(oq), np.asarray(oq1))
