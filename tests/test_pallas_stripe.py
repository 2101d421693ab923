"""Stripe-form fused RDB kernel (ops/pallas_stripe.py) vs the naive
torch-ordered reference — interpret mode on CPU (SURVEY.md §4 kernel
strategy). Unlike the round-1 block kernel (tolerance 5e-2 from its
valid-chain edge approximation), the stripe kernel reproduces basicsr's
per-conv SAME zero-padding exactly, so fp32 parity is ~1e-7 including the
frame edges."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_restore_tpu.models.rrdbnet import (
    RRDBNetSpec,
    _rdb_apply,
    init_rrdbnet,
)
from video_restore_tpu.ops.pallas_stripe import (
    prefix_rdb_weights,
    rdb_stripe,
)


def _one_rdb(nf=16, gc=8, seed=0):
    spec = RRDBNetSpec(num_feat=nf, num_block=1, num_grow_ch=gc)
    params = init_rrdbnet(jax.random.PRNGKey(seed), spec)
    rdb = jax.tree.map(lambda a: a[0], params["body"]["rdb1"])
    ws, bs = prefix_rdb_weights(rdb, nf, gc)
    return rdb, tuple(ws), tuple(bs)


@pytest.mark.parametrize(
    "shape",
    [
        (1, 32, 32),
        (2, 64, 48),
        (1, 40, 56),
        (1, 33, 31),  # odd extents: H padded to the stripe, W masked
    ],
)
def test_rdb_stripe_exact_same_padding(rng, shape):
    b, h, w = shape
    rdb, ws, bs = _one_rdb()
    x = jnp.asarray(rng.random((b, h, w, 16)).astype(np.float32))
    ref = np.asarray(_rdb_apply(rdb, x))
    out = np.asarray(rdb_stripe(x, ws, bs, interpret=True))
    assert out.shape == ref.shape
    # exact SAME semantics: only fp summation order differs
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_rdb_stripe_multi_stripe_grid(rng):
    """H spanning several stripes + batch > 1 exercises the cross-iteration
    double-buffer slots."""
    rdb, ws, bs = _one_rdb()
    x = jnp.asarray(rng.random((3, 96, 40, 16)).astype(np.float32))
    ref = np.asarray(_rdb_apply(rdb, x))
    out = np.asarray(rdb_stripe(x, ws, bs, block_h=32, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_rdb_stripe_bf16(rng):
    rdb, ws, bs = _one_rdb()
    x = jnp.asarray(rng.random((1, 32, 32, 16)), jnp.bfloat16)
    ref = np.asarray(_rdb_apply(rdb, x)).astype(np.float32)
    out = np.asarray(rdb_stripe(x, ws, bs, interpret=True)).astype(np.float32)
    assert np.abs(out - ref).max() < 0.05


def test_rdb_stripe_padded_chain(rng):
    """Chained padded-form RDBs + RRDB residual == unpadded reference, and
    the pad-region zero invariant survives the chain (the next kernel's
    SAME semantics depend on it)."""
    from video_restore_tpu.ops.pallas_stripe import (
        _HALO,
        _PADL,
        pad_stripe_entry,
        rdb_stripe_padded,
        unpad_stripe_exit,
    )

    rdb1, ws1, bs1 = _one_rdb(seed=0)
    rdb2, ws2, bs2 = _one_rdb(seed=1)
    b, h, w, nf = 2, 48, 40, 16
    x = jnp.asarray(rng.random((b, h, w, nf)).astype(np.float32))
    ref = _rdb_apply(rdb2, _rdb_apply(rdb1, x)) * 0.2 + x

    bh = 32
    xp = pad_stripe_entry(x, block_h=bh)
    o = rdb_stripe_padded(
        xp, ws1, bs1, frame_h=h, frame_w=w, block_h=bh, interpret=True
    )
    o = rdb_stripe_padded(
        o, ws2, bs2, frame_h=h, frame_w=w, block_h=bh, interpret=True
    )
    o = o * 0.2 + xp
    out = unpad_stripe_exit(o, h, w, nf, block_h=bh)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
    op = np.asarray(o)
    assert np.all(op[:, :bh] == 0) and np.all(op[:, bh + h :] == 0)
    assert np.all(op[:, :, : _PADL] == 0)
    assert np.all(op[:, :, _PADL + w :] == 0)
    assert np.all(op[..., nf:] == 0)


def test_rdb_res_stripe_padded(rng):
    """rdb3+residual kernel (output aliased to the block-input buffer) ==
    rdb then x0 + 0.2*out, with the inherited pad-zero invariant."""
    from video_restore_tpu.ops.pallas_stripe import (
        _PADL,
        pad_stripe_entry,
        rdb_res_stripe_padded,
        rdb_stripe_padded,
        unpad_stripe_exit,
    )

    rdb1, ws1, bs1 = _one_rdb(seed=0)
    rdb3, ws3, bs3 = _one_rdb(seed=2)
    b, h, w, nf = 2, 56, 40, 16
    x = jnp.asarray(rng.random((b, h, w, nf)).astype(np.float32))
    ref = _rdb_apply(rdb3, _rdb_apply(rdb1, x)) * 0.2 + x

    bh = 32
    xp = pad_stripe_entry(x, block_h=bh)
    o = rdb_stripe_padded(
        xp, ws1, bs1, frame_h=h, frame_w=w, block_h=bh, interpret=True
    )
    o = rdb_res_stripe_padded(
        o, xp, ws3, bs3, frame_h=h, frame_w=w, block_h=bh, interpret=True
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


def test_rrdb_stripe_fused(rng):
    """Whole-RRDB fused kernel (3 chained RDB stages + residual in one
    program) == the naive torch-ordered chain, and the pad-zero invariant
    holds on its output."""
    from video_restore_tpu.ops.pallas_stripe import (
        _PADL,
        pad_stripe_entry,
        rrdb_stripe_padded,
        unpad_stripe_exit,
    )

    rdbs = [_one_rdb(seed=s) for s in range(3)]
    b, h, w, nf = 2, 56, 40, 16  # h not a multiple of bh: alignment rows
    x = jnp.asarray(rng.random((b, h, w, nf)).astype(np.float32))
    ref = x
    for rdb, _, _ in rdbs:
        ref = _rdb_apply(rdb, ref)
    ref = ref * 0.2 + x

    ws = [wk for _, w5, _ in rdbs for wk in w5]
    bs = [bk for _, _, b5 in rdbs for bk in b5]
    bh = 32
    xp = pad_stripe_entry(x, block_h=bh)
    o = rrdb_stripe_padded(
        xp, ws, bs, frame_h=h, frame_w=w, block_h=bh, interpret=True
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


def test_prefix_weights_shapes():
    nf, gc = 16, 8
    _, ws, bs = _one_rdb(nf, gc)
    couts = [nf + 4 * gc, nf + 3 * gc, nf + 2 * gc, nf + gc, nf]
    cins = [nf, gc, gc, gc, gc]
    for w, cin, cout in zip(ws, cins, couts):
        assert w.shape == (3, 3 * cin, cout)
    assert bs[0].shape == (gc,) and bs[4].shape == (nf,)


def test_full_model_stripe_path_interpret(rng):
    """_apply(stripe=True) through interpret-mode pallas must agree with
    the regrouped XLA path end to end (prepared and unprepared)."""
    from unittest import mock

    import video_restore_tpu.ops.pallas_stripe as pk
    from video_restore_tpu.models.rrdbnet import (
        _apply,
        apply_rrdbnet,
        prepare_rrdbnet,
    )

    spec = RRDBNetSpec(num_feat=16, num_block=2, num_grow_ch=8, scale=4)
    params = init_rrdbnet(jax.random.PRNGKey(1), spec)
    x = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    ref = np.asarray(apply_rrdbnet(params, x, spec, use_pallas=False))

    orig1 = pk.rdb_stripe_padded
    orig2 = pk.rdb_res_stripe_padded

    def interp1(xx, ws, bs, **kw):
        kw["interpret"] = True
        return orig1(xx, ws, bs, **kw)

    def interp2(xx, x0, ws, bs, **kw):
        kw["interpret"] = True
        return orig2(xx, x0, ws, bs, **kw)

    with mock.patch.object(
        pk, "rdb_stripe_padded", interp1
    ), mock.patch.object(pk, "rdb_res_stripe_padded", interp2):
        out = np.asarray(_apply(params, x, spec.scale, stripe=True))
        pp = prepare_rrdbnet(params, "stripe", spec.num_feat, spec.num_grow_ch)
        out_prep = np.asarray(
            _apply(pp, x, spec.scale, stripe=True, prepared=True)
        )
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(out_prep, ref, rtol=2e-4, atol=2e-4)


def test_npacked_conv_parity(rng):
    """N-packed dx contraction (one (M,K)x(K,3N) matmul + slice/roll/add)
    must match the 3-matmul stripe form and the naive RDB exactly."""
    from video_restore_tpu.models.rrdbnet import _rdb_apply, init_rrdbnet
    from video_restore_tpu.ops.pallas_stripe import (
        pack_prefix_weights,
        prefix_rdb_weights,
        rdb_stripe,
    )

    spec = RRDBNetSpec(num_feat=16, num_block=1, num_grow_ch=8)
    params = init_rrdbnet(jax.random.PRNGKey(3), spec)
    rdb = jax.tree.map(lambda a: a[0], params["body"]["rdb1"])
    x = jnp.asarray(rng.random((1, 24, 20, 16)).astype(np.float32))
    ref = np.asarray(_rdb_apply(rdb, x))
    ws, bs = prefix_rdb_weights(rdb, 16, 8)
    for pack in [(0, 1, 4), (0, 1, 2, 3, 4)]:
        wsp = pack_prefix_weights(ws, pack)
        out = np.asarray(
            rdb_stripe(x, wsp, bs, block_h=8, interpret=True)
        )
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_im2col_conv_parity(rng):
    """im2col contraction (K = 9cin, dx folded into K, zero rolls) must
    match the 3-matmul stripe form and the naive RDB exactly — including
    mixed selections alongside N-packed sources."""
    from video_restore_tpu.models.rrdbnet import _rdb_apply, init_rrdbnet
    from video_restore_tpu.ops.pallas_stripe import (
        im2col_prefix_weights,
        pack_prefix_weights,
        prefix_rdb_weights,
        rdb_stripe,
    )

    spec = RRDBNetSpec(num_feat=16, num_block=1, num_grow_ch=8)
    params = init_rrdbnet(jax.random.PRNGKey(5), spec)
    rdb = jax.tree.map(lambda a: a[0], params["body"]["rdb1"])
    x = jnp.asarray(rng.random((1, 24, 20, 16)).astype(np.float32))
    ref = np.asarray(_rdb_apply(rdb, x))
    ws, bs = prefix_rdb_weights(rdb, 16, 8)
    for sel in [(0, 1, 2, 3, 4), (0, 2)]:
        wsi = im2col_prefix_weights(ws, sel)
        out = np.asarray(
            rdb_stripe(x, wsi, bs, block_h=8, interpret=True)
        )
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
    # mixed: im2col on the wide conv, N-pack on the growth convs
    wsm = im2col_prefix_weights(
        pack_prefix_weights(ws, (1, 4)), (0,)
    )
    out = np.asarray(rdb_stripe(x, wsm, bs, block_h=8, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_sd_tail_parity(rng, monkeypatch):
    """sd-throughout tail (VRT_SD_TAIL=1) == reference tail, both
    unprepared and through prepare_rrdbnet, incl. the single-upsample
    (BSRGANx2) topology."""
    from video_restore_tpu.models.rrdbnet import (
        _apply,
        apply_rrdbnet,
        init_rrdbnet,
        prepare_rrdbnet,
    )

    for unshuffle, scale in [(True, 4), (False, 2)]:
        spec = RRDBNetSpec(
            num_feat=16, num_block=2, num_grow_ch=8, scale=scale,
            unshuffle=unshuffle,
        )
        params = init_rrdbnet(jax.random.PRNGKey(4), spec)
        x = jnp.asarray(rng.random((1, 12, 16, 3)).astype(np.float32))
        ref = np.asarray(apply_rrdbnet(params, x, spec, use_pallas=False))

        monkeypatch.setenv("VRT_SD_TAIL", "1")
        out = np.asarray(
            _apply(params, x, spec.scale, unshuffle=unshuffle)
        )
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
        pp = prepare_rrdbnet(params, "regrouped", 16, 8)
        out_p = np.asarray(
            _apply(pp, x, spec.scale, prepared=True, unshuffle=unshuffle)
        )
        np.testing.assert_allclose(out_p, ref, rtol=2e-4, atol=2e-4)
        monkeypatch.delenv("VRT_SD_TAIL")


def test_tail_fused_kernel_parity(rng):
    """Fused Pallas tail (upconv2 + conv_hr + conv_last,
    ops/pallas_tail.py) == the XLA tail, interpret mode."""
    from video_restore_tpu.ops.conv import conv2d, leaky_relu, upconv2x
    from video_restore_tpu.ops.pallas_tail import tail_fused

    nf = 16
    def mk(s):
        return jnp.asarray(rng.random(s) * 0.1, jnp.float32)

    wu2, bu2 = mk((3, 3, nf, nf)), mk((nf,))
    whr, bhr = mk((3, 3, nf, nf)), mk((nf,))
    wl, bl = mk((3, 3, nf, 3)), mk((3,))
    xh = jnp.asarray(rng.random((2, 20, 24, nf)), jnp.float32)

    f = leaky_relu(upconv2x(xh, wu2, bu2))
    f = leaky_relu(conv2d(f, whr, bhr))
    ref = np.asarray(conv2d(f, wl, bl))
    got = np.asarray(
        tail_fused(xh, wu2, bu2, whr, bhr, wl, bl, block_h=4,
                   interpret=True)
    )
    assert got.shape == ref.shape == (2, 40, 48, 3)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    # reduced row-chunk path (full-frame widths auto-scale rc down to
    # bound the fp32 accumulator VMEM; rc no longer divides the stripe)
    got2 = np.asarray(
        tail_fused(xh, wu2, bu2, whr, bhr, wl, bl, block_h=4,
                   row_chunk=3, interpret=True)
    )
    np.testing.assert_allclose(got2, ref, rtol=2e-4, atol=2e-4)


def test_up1_fused_kernel_parity(rng):
    """Fused phase-form upconv1 (ops/pallas_tail.py up1_fused) ==
    leaky_relu(upconv2x(...)), interpret mode, incl. a non-dividing
    stripe height."""
    from video_restore_tpu.ops.conv import leaky_relu, upconv2x
    from video_restore_tpu.ops.pallas_tail import up1_fused

    nf = 16
    w = jnp.asarray(rng.random((3, 3, nf, nf)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.random((nf,)) * 0.1, jnp.float32)
    for h1, bh in ((20, 4), (18, 4)):
        x = jnp.asarray(rng.random((2, h1, 24, nf)), jnp.float32)
        ref = np.asarray(leaky_relu(upconv2x(x, w, b)))
        got = np.asarray(up1_fused(x, w, b, block_h=bh, interpret=True))
        assert got.shape == ref.shape == (2, 2 * h1, 48, nf)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_tail_fused_q_parity(rng):
    """Quad tail (tail_fused_q on up1_fused's raw masked output) == the
    XLA upconv1->upconv2->conv_hr->conv_last chain, interpret mode.

    Biases are shifted +0.3 to keep pre-activations away from the
    leaky-relu kink: the quad form sums conv taps in a different order,
    and a near-zero pre-activation crossing the kink under fp
    reassociation turns an O(eps) difference into O(|x|) — observed once
    with unshifted random weights (0.012 at one pixel), bit-fine
    everywhere else.
    """
    from video_restore_tpu.ops.conv import conv2d, leaky_relu, upconv2x
    from video_restore_tpu.ops.pallas_tail import up1_fused, tail_fused_q

    nf = 8

    def mk(s):
        return jnp.asarray(rng.random(s) * 0.1, jnp.float32)

    for h1, w1 in ((12, 16), (10, 20)):
        x1 = jnp.asarray(rng.random((1, h1, w1, nf)), jnp.float32)
        wu1, bu1 = mk((3, 3, nf, nf)), mk((nf,)) + 0.3
        wu2, bu2 = mk((3, 3, nf, nf)), mk((nf,)) + 0.3
        whr, bhr = mk((3, 3, nf, nf)), mk((nf,)) + 0.3
        wl, bl = mk((3, 3, nf, 3)), mk((3,))
        f = leaky_relu(upconv2x(x1, wu1, bu1))
        f = leaky_relu(upconv2x(f, wu2, bu2))
        f = leaky_relu(conv2d(f, whr, bhr))
        ref = np.asarray(conv2d(f, wl, bl))
        xq = up1_fused(x1, wu1, bu1, masked=True, block_h=4,
                       interpret=True)
        got = np.asarray(
            tail_fused_q(xq, wu2, bu2, whr, bhr, wl, bl,
                         h2=2 * h1, w1=w1, block_h=4, interpret=True)
        )
        assert got.shape == ref.shape == (1, 4 * h1, 4 * w1, 3)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_tail_fused_raw_parity(rng):
    """tail_fused_raw (tail DMAs up1's raw lane-paired output, unpacks
    in VMEM) == the pre-padded chain (up1_raw_to_tail_input + tail_fused)
    — the round-4 form that deletes the ~2.1GB/frame pre-pad rewrite."""
    from video_restore_tpu.ops.pallas_tail import (
        tail_fused,
        tail_fused_raw,
        up1_fused,
        up1_raw_to_tail_input,
    )

    nf, h1, w1 = 16, 24, 22
    x1 = jnp.asarray(
        (rng.random((1, h1, w1, nf)) - 0.5).astype(np.float32)
    )
    wu1 = jnp.asarray(
        (rng.random((3, 3, nf, nf)) - 0.5).astype(np.float32) * 0.4
    )
    bu1 = jnp.asarray(rng.random((nf,)).astype(np.float32) * 0.1)
    wu2 = jnp.asarray(
        (rng.random((3, 3, nf, nf)) - 0.5).astype(np.float32) * 0.4
    )
    bu2 = jnp.asarray(rng.random((nf,)).astype(np.float32) * 0.1)
    whr = jnp.asarray(
        (rng.random((3, 3, nf, nf)) - 0.5).astype(np.float32) * 0.4
    )
    bhr = jnp.asarray(rng.random((nf,)).astype(np.float32) * 0.1)
    wl = jnp.asarray(
        (rng.random((3, 3, nf, 3)) - 0.5).astype(np.float32) * 0.4
    )
    bl = jnp.asarray(rng.random((3,)).astype(np.float32) * 0.1)

    xq = up1_fused(x1, wu1, bu1, masked=True, interpret=True)
    h2, w2 = 2 * h1, 2 * w1
    tw = (wu2, bu2, whr, bhr, wl, bl)
    ref = tail_fused(
        up1_raw_to_tail_input(xq, h2, w2), *tw,
        pre_padded=True, h2=h2, w2=w2, interpret=True,
    )
    got = tail_fused_raw(xq, *tw, h2=h2, w2=w2, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_full_model_raw_up1_chain(rng, monkeypatch):
    """Production default tail chain (up1_fused masked raw output + one
    fused crop+pad + tail_fused pre_padded, interpret-mocked) == naive."""
    from unittest import mock

    import video_restore_tpu.ops.pallas_tail as pt
    from video_restore_tpu.models.rrdbnet import _apply, apply_rrdbnet

    monkeypatch.setenv("VRT_TAIL_KERNEL", "1")
    monkeypatch.setenv("VRT_UP1_RAW", "1")

    origs = {
        n: getattr(pt, n)
        for n in ("up1_fused", "tail_fused", "tail_fused_raw")
    }

    def wrap(name):
        def f(*a, **kw):
            kw["interpret"] = True
            return origs[name](*a, **kw)

        return f

    specs = (
        RRDBNetSpec(num_feat=16, num_block=1, num_grow_ch=8, scale=4),
        # x2plus-style: pixel-unshuffled stem, BOTH upconv stages — the
        # config-1 production chain
        RRDBNetSpec(num_feat=16, num_block=1, num_grow_ch=8, scale=2),
    )
    for spec in specs:
        params = init_rrdbnet(jax.random.PRNGKey(7), spec)
        assert "conv_up2" in params
        x = jnp.asarray(rng.random((1, 18, 22, 3)).astype(np.float32))
        ref = np.asarray(apply_rrdbnet(params, x, spec, naive=True))

        _apply.clear_cache()
        with mock.patch.object(
            pt, "up1_fused", wrap("up1_fused")
        ), mock.patch.object(
            pt, "tail_fused", wrap("tail_fused")
        ), mock.patch.object(
            pt, "tail_fused_raw", wrap("tail_fused_raw")
        ):
            got = np.asarray(
                apply_rrdbnet(params, x, spec, use_pallas=False)
            )
        assert got.shape == (1, 18 * spec.scale, 22 * spec.scale, 3)
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_full_model_x2_kernel_tail(rng, monkeypatch):
    """Single-upsample x2 nets (BSRGANx2-style, no conv_up2): the tail
    assembled from up1_fused + conv3x3_fused (interpret-mocked) == naive."""
    from unittest import mock

    import video_restore_tpu.ops.pallas_tail as pt
    from video_restore_tpu.models.rrdbnet import _apply, apply_rrdbnet

    monkeypatch.setenv("VRT_TAIL_KERNEL", "1")
    spec = RRDBNetSpec(
        num_feat=16, num_block=1, num_grow_ch=8, scale=2, unshuffle=False
    )
    params = init_rrdbnet(jax.random.PRNGKey(7), spec)
    assert "conv_up2" not in params
    x = jnp.asarray(rng.random((1, 20, 16, 3)).astype(np.float32))
    ref = np.asarray(apply_rrdbnet(params, x, spec, naive=True))

    origs = {n: getattr(pt, n) for n in ("up1_fused", "conv3x3_fused")}

    def wrap(name):
        def f(*a, **kw):
            kw["interpret"] = True
            return origs[name](*a, **kw)

        return f

    _apply.clear_cache()
    with mock.patch.object(
        pt, "up1_fused", wrap("up1_fused")
    ), mock.patch.object(pt, "conv3x3_fused", wrap("conv3x3_fused")):
        got = np.asarray(apply_rrdbnet(params, x, spec, use_pallas=False))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_conv3x3_fused_kernel_parity(rng):
    """Generic fused 3x3 stripe conv (conv_first / conv_body+residual
    glue kernel) == conv2d, interpret mode: cin=3 stem shape, residual
    form, lrelu form, non-dividing stripe height."""
    from video_restore_tpu.ops.conv import conv2d, leaky_relu
    from video_restore_tpu.ops.pallas_tail import conv3x3_fused

    cases = (
        (3, 16, "none", False, 20),
        (16, 16, "none", True, 18),
        (16, 16, "lrelu", False, 20),
        (3, 16, "prelu", False, 20),  # SRVGG stem form
    )
    for cin, cout, act, use_res, h in cases:
        x = jnp.asarray(rng.random((2, h, 24, cin)) - 0.4, jnp.float32)
        w = jnp.asarray(rng.random((3, 3, cin, cout)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.random((cout,)) * 0.1 - 0.05, jnp.float32)
        alpha = (
            jnp.asarray(rng.random((cout,)) * 0.5, jnp.float32)
            if act == "prelu" else None
        )
        res = (
            jnp.asarray(rng.random((2, h, 24, cout)), jnp.float32)
            if use_res else None
        )
        ref = conv2d(x, w, b)
        if act == "lrelu":
            ref = leaky_relu(ref)
        elif act == "prelu":
            ref = jnp.where(ref > 0, ref, ref * alpha)
        if use_res:
            ref = ref + res
        got = conv3x3_fused(x, w, b, res, alpha, act=act, block_h=4,
                            interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
        )


def test_full_model_glue_kernels(rng, monkeypatch):
    """Production path with VRT_GLUE_KERNEL=1 (stem + conv_body/residual
    stripe kernels, interpret-mocked) == the plain XLA path."""
    from unittest import mock

    import video_restore_tpu.ops.pallas_tail as pt
    from video_restore_tpu.models.rrdbnet import apply_rrdbnet

    monkeypatch.setenv("VRT_GLUE_KERNEL", "1")
    spec = RRDBNetSpec(num_feat=16, num_block=1, num_grow_ch=8, scale=2)
    params = init_rrdbnet(jax.random.PRNGKey(7), spec)
    x = jnp.asarray(rng.random((1, 20, 16, 3)).astype(np.float32))
    # naive=True is a different _apply static key — the production
    # (gated) program would otherwise be served from the jit cache,
    # compiled before the env flip / mock could take effect
    ref = np.asarray(apply_rrdbnet(params, x, spec, naive=True))

    orig = pt.conv3x3_fused
    calls = []

    def interp(xx, w, b, res=None, **kw):
        calls.append(xx.shape)
        kw["interpret"] = True
        return orig(xx, w, b, res, **kw)

    from video_restore_tpu.models.rrdbnet import _apply

    _apply.clear_cache()  # other tests may have cached these statics
    with mock.patch.object(pt, "conv3x3_fused", interp):
        got = np.asarray(apply_rrdbnet(params, x, spec, use_pallas=False))
    assert len(calls) == 2  # stem + conv_body
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_full_model_stripe_im2col_env(rng, monkeypatch):
    """Production path with VRT_IM2COL=23 (im2col on the sources N-packing
    leaves alone) == the plain XLA path, unprepared and prepared."""
    from unittest import mock

    import video_restore_tpu.ops.pallas_stripe as pk
    from video_restore_tpu.models.rrdbnet import (
        _apply,
        apply_rrdbnet,
        prepare_rrdbnet,
    )

    monkeypatch.setenv("VRT_IM2COL", "23")
    spec = RRDBNetSpec(num_feat=16, num_block=1, num_grow_ch=8, scale=2)
    params = init_rrdbnet(jax.random.PRNGKey(7), spec)
    x = jnp.asarray(rng.random((1, 20, 16, 3)).astype(np.float32))
    ref = np.asarray(apply_rrdbnet(params, x, spec, use_pallas=False))

    orig1 = pk.rdb_stripe_padded
    orig2 = pk.rdb_res_stripe_padded

    def interp1(xx, ws, bs, **kw):
        assert any(w.ndim == 2 and w.shape[0] > w.shape[1] for w in ws)
        kw["interpret"] = True
        return orig1(xx, ws, bs, **kw)

    def interp2(xx, x0, ws, bs, **kw):
        assert any(w.ndim == 2 and w.shape[0] > w.shape[1] for w in ws)
        kw["interpret"] = True
        return orig2(xx, x0, ws, bs, **kw)

    with mock.patch.object(
        pk, "rdb_stripe_padded", interp1
    ), mock.patch.object(pk, "rdb_res_stripe_padded", interp2):
        out = np.asarray(_apply(params, x, spec.scale, stripe=True))
        pp = prepare_rrdbnet(params, "stripe", spec.num_feat, spec.num_grow_ch)
        out_prep = np.asarray(
            _apply(pp, x, spec.scale, stripe=True, prepared=True)
        )
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(out_prep, ref, rtol=2e-4, atol=2e-4)


def test_rdb_stripe2d_chain(rng):
    """2D-blocked padded form (H stripes x W blocks, margin-DMA): chained
    RDBs + res kernel == unpadded reference; pad-zero invariant holds.
    Exercises interior W blocks, both frame-edge fixups, hp>h and wp>w
    masking, and batch>1 double-buffering."""
    from video_restore_tpu.ops.pallas_stripe import (
        pad_stripe2d_entry,
        rdb_res_stripe2d_padded,
        rdb_stripe2d_padded,
        unpad_stripe2d_exit,
    )

    rdb1, ws1, bs1 = _one_rdb(seed=0)
    rdb2, ws2, bs2 = _one_rdb(seed=1)
    rdb3, ws3, bs3 = _one_rdb(seed=2)
    b, h, w, nf = 2, 40, 41, 16
    x = jnp.asarray(rng.random((b, h, w, nf)).astype(np.float32))
    ref = (
        _rdb_apply(rdb3, _rdb_apply(rdb2, _rdb_apply(rdb1, x))) * 0.2 + x
    )

    bh, bw = 16, 16  # ns=3 (hp=48>40), nwb=3 (wp=48>41)
    kw = dict(
        frame_h=h, frame_w=w, block_h=bh, block_w=bw, interpret=True
    )
    xp = pad_stripe2d_entry(x, block_h=bh, block_w=bw)
    o = rdb_stripe2d_padded(xp, ws1, bs1, **kw)
    o = rdb_stripe2d_padded(o, ws2, bs2, **kw)
    o = rdb_res_stripe2d_padded(o, xp, ws3, bs3, **kw)
    out = unpad_stripe2d_exit(o, h, w, nf, block_h=bh, block_w=bw)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
    op = np.asarray(o)
    assert np.all(op[:, :bh] == 0) and np.all(op[:, bh + h :] == 0)
    assert np.all(op[:, :, w:] == 0)
    assert np.all(op[..., nf:] == 0)


def test_rdb_stripe2d_row_chunked(rng):
    """Row-chunked accumulator form (round 4): the 5-conv chain runs in
    rc-row chunks with 1 acc row + 2 growth rows carried per stage —
    pure re-association of row ranges, so it must match both the
    monolithic kernel and the XLA reference. Exercises multi-chunk
    (n1=48, rc=16 -> 3 chunks), clipped first-chunk starts, the
    remainder-absorbing last chunk (rc=20 -> chunks 20+28), and the res
    epilogue."""
    from video_restore_tpu.ops.pallas_stripe import (
        pad_stripe2d_entry,
        rdb_res_stripe2d_padded,
        rdb_stripe2d_padded,
        unpad_stripe2d_exit,
    )

    rdb1, ws1, bs1 = _one_rdb(seed=0)
    rdb3, ws3, bs3 = _one_rdb(seed=2)
    b, h, w, nf = 1, 80, 41, 16
    x = jnp.asarray(rng.random((b, h, w, nf)).astype(np.float32))
    ref = _rdb_apply(rdb3, _rdb_apply(rdb1, x)) * 0.2 + x

    bh, bw = 40, 16  # n1 = bh+8 = 48 acc rows per stripe
    for rc in (16, 20):
        # fresh pad each round: the res kernel donates xp's buffer
        xp = pad_stripe2d_entry(x, block_h=bh, block_w=bw)
        kw = dict(
            frame_h=h, frame_w=w, block_h=bh, block_w=bw,
            row_chunk=rc, interpret=True,
        )
        o = rdb_stripe2d_padded(xp, ws1, bs1, **kw)
        o = rdb_res_stripe2d_padded(o, xp, ws3, bs3, **kw)
        out = unpad_stripe2d_exit(o, h, w, nf, block_h=bh, block_w=bw)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )
        op = np.asarray(o)
        assert np.all(op[:, :bh] == 0) and np.all(op[:, bh + h :] == 0)
        assert np.all(op[:, :, w:] == 0)


def test_rdb_stripe2d_split_launches(rng):
    """Split edge/interior launches == the single-call 2D kernels
    bit-for-bit: the masked ring (rows + cols calls) and the mask-free
    interior call compose via aliasing; halo/pad zeros preserved.
    Covers both the plain RDB and the res (RRDB residual) form."""
    from video_restore_tpu.ops.pallas_stripe import (
        pad_stripe2d_entry,
        rdb_res_stripe2d_padded,
        rdb_stripe2d_padded,
        rdb_stripe2d_split,
        stripe2d_split_ok,
    )

    rdb1, ws1, bs1 = _one_rdb(seed=0)
    rdb3, ws3, bs3 = _one_rdb(seed=2)
    b, h, w, nf = 2, 64, 72, 16
    bh, bw = 16, 24  # ns=4, nwb=3 — a true interior exists
    assert stripe2d_split_ok(h, w, bh, bw)
    x = jnp.asarray(rng.random((b, h, w, nf)).astype(np.float32) - 0.5)
    kw = dict(
        frame_h=h, frame_w=w, block_h=bh, block_w=bw, interpret=True
    )
    xp = np.asarray(pad_stripe2d_entry(x, block_h=bh, block_w=bw))
    ref = np.asarray(
        rdb_stripe2d_padded(jnp.asarray(xp), ws1, bs1, **kw)
    )
    got = np.asarray(
        rdb_stripe2d_split(jnp.asarray(xp), ws1, bs1, **kw)
    )
    # tolerance: interpret mode lowers each call through XLA:CPU whose
    # fusion choices can flip the last fp32 bit (on TPU Mosaic the split
    # form measured bit-exact vs the single-call kernels)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
    rref = rdb_res_stripe2d_padded(
        jnp.asarray(ref), jnp.asarray(xp), ws3, bs3, **kw
    )
    rgot = rdb_stripe2d_split(
        jnp.asarray(ref), ws3, bs3, x0=jnp.asarray(xp), res=True, **kw
    )
    np.testing.assert_allclose(
        np.asarray(rgot), np.asarray(rref), rtol=1e-6, atol=1e-6
    )
    g = np.asarray(rgot)
    assert np.all(g[:, :bh] == 0) and np.all(g[:, bh + h :] == 0)
    assert np.all(g[:, :, w:] == 0)
    # res + row-chunked accumulator (the production default: the
    # unchunked res split kernel ran 984KB over the VMEM limit at
    # flagship geometry, so the res call row-chunks — must stay exact).
    # rc floor is 16, so use a taller-block geometry where chunking
    # actually engages (bh=32 > rc=16).
    h2, bh2 = 128, 32  # ns=4 with bw=24, nwb=3 — interior exists
    assert stripe2d_split_ok(h2, w, bh2, bw)
    x2 = jnp.asarray(rng.random((b, h2, w, nf)).astype(np.float32) - 0.5)
    kw2 = dict(
        frame_h=h2, frame_w=w, block_h=bh2, block_w=bw, interpret=True
    )
    xp2 = pad_stripe2d_entry(x2, block_h=bh2, block_w=bw)
    ref2 = rdb_stripe2d_padded(xp2, ws1, bs1, **kw2)
    rref2 = rdb_res_stripe2d_padded(ref2, xp2, ws3, bs3, **kw2)
    rgot_rc = rdb_stripe2d_split(
        ref2, ws3, bs3, x0=xp2, res=True, row_chunk=16, **kw2
    )
    np.testing.assert_allclose(
        np.asarray(rgot_rc), np.asarray(rref2), rtol=1e-6, atol=1e-6
    )


def test_rdb_stripe2d_packed_weights(rng):
    """2D form with the production N-packed contraction weights."""
    from video_restore_tpu.ops.pallas_stripe import (
        pack_prefix_weights,
        pad_stripe2d_entry,
        rdb_stripe2d_padded,
        unpad_stripe2d_exit,
    )

    rdb1, ws1, bs1 = _one_rdb(seed=3)
    wsp = tuple(pack_prefix_weights(list(ws1)))
    b, h, w, nf = 1, 32, 48, 16
    x = jnp.asarray(rng.random((b, h, w, nf)).astype(np.float32))
    ref = np.asarray(_rdb_apply(rdb1, x))
    xp = pad_stripe2d_entry(x, block_h=16, block_w=24)
    o = rdb_stripe2d_padded(
        xp, wsp, bs1, frame_h=h, frame_w=w, block_h=16, block_w=24,
        interpret=True,
    )
    out = unpad_stripe2d_exit(o, h, w, nf, block_h=16, block_w=24)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_stripe2d_geometry_picker():
    """Flagship frame geometry: full-frame 1080p fits the VMEM anchor with
    materially less MAC overhead than the tiled full-width form (1.34x)."""
    from video_restore_tpu.ops.pallas_stripe import (
        _HALO,
        _MW,
        _VMEM_ROWS_WF,
        _pick_bh_bw,
        stripe2d_supported,
    )

    bh, bw = _pick_bh_bw(1080, 1920)
    assert (bh + 2 * _HALO) * (bw + 2 * _MW) <= _VMEM_ROWS_WF
    hp = -(-1080 // bh) * bh
    wp = -(-1920 // bw) * bw
    overhead = (
        (bh + 2 * _HALO) / bh * (bw + 2 * _MW) / bw
        * (hp * wp) / (1080 * 1920)
    )
    assert overhead < 1.20
    assert stripe2d_supported(1080, 1920)
    assert not stripe2d_supported(8, 8)


def test_full_model_stripe2d_env(rng, monkeypatch):
    """Production path with VRT_STRIPE2D forced: the 2D-blocked body ==
    the plain XLA path, unprepared and prepared."""
    from unittest import mock

    import video_restore_tpu.ops.pallas_stripe as pk
    from video_restore_tpu.models.rrdbnet import (
        _apply,
        apply_rrdbnet,
        prepare_rrdbnet,
    )

    monkeypatch.setenv("VRT_STRIPE2D", "8x16")
    spec = RRDBNetSpec(num_feat=16, num_block=2, num_grow_ch=8, scale=2)
    params = init_rrdbnet(jax.random.PRNGKey(9), spec)
    x = jnp.asarray(rng.random((1, 36, 36, 3)).astype(np.float32))
    ref = np.asarray(apply_rrdbnet(params, x, spec, use_pallas=False))

    orig1 = pk.rdb_stripe2d_padded
    orig2 = pk.rdb_res_stripe2d_padded

    def interp1(xx, ws, bs, **kw):
        kw["interpret"] = True
        return orig1(xx, ws, bs, **kw)

    def interp2(xx, x0, ws, bs, **kw):
        kw["interpret"] = True
        return orig2(xx, x0, ws, bs, **kw)

    with mock.patch.object(
        pk, "rdb_stripe2d_padded", interp1
    ), mock.patch.object(pk, "rdb_res_stripe2d_padded", interp2):
        out = np.asarray(_apply(params, x, spec.scale, stripe=True))
        pp = prepare_rrdbnet(params, "stripe", spec.num_feat, spec.num_grow_ch)
        out_prep = np.asarray(
            _apply(pp, x, spec.scale, stripe=True, prepared=True)
        )
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(out_prep, ref, rtol=2e-4, atol=2e-4)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    rng_ = b.max() - b.min()
    return 10 * np.log10(rng_ * rng_ / max(mse, 1e-20))


def test_quantize_prefix_weights_layouts(rng):
    """Round-trip property: q * s reconstructs every prefix-form layout
    (per-dx, N-packed, im2col) to within half an LSB per element, and the
    N-packed scale is shared across a channel's three dx lane copies."""
    from video_restore_tpu.ops.pallas_stripe import (
        im2col_prefix_weights,
        pack_prefix_weights,
        prefix_rdb_weights,
        quantize_prefix_weights,
    )

    rdb, ws, bs = _one_rdb()
    for form in (
        ws,
        pack_prefix_weights(ws, (0, 1, 4)),
        im2col_prefix_weights(ws, (2, 3)),
    ):
        qws, sws = quantize_prefix_weights(form)
        for w, q, s in zip(form, qws, sws):
            assert q.dtype == jnp.int8
            assert s.shape[-1] in (w.shape[-1], w.shape[-1] // 3)
            if q.ndim == 2 and q.shape[-2] < q.shape[-1]:  # npacked
                rec = np.asarray(q, np.float32).reshape(
                    q.shape[0], 3, -1
                ) * np.asarray(s)
                rec = rec.reshape(q.shape)
            elif q.ndim == 2:  # im2col
                rec = np.asarray(q, np.float32) * np.asarray(s)
            else:  # per-dx
                rec = np.asarray(q, np.float32) * np.asarray(s)
            err = np.abs(rec - np.asarray(w, np.float32))
            assert err.max() <= np.asarray(s).max() * 0.5 + 1e-7


def test_rdb_stripe2d_int8_interpret(rng):
    """W8A8 2D stripe kernel (quantize_prefix_weights + sws) vs the fp32
    naive RDB: the quantization error budget for one RDB is far inside
    50 dB PSNR (the interpret-mode smoke measured ~82 dB), and the
    padded-form zero invariant must hold exactly."""
    from video_restore_tpu.ops.pallas_stripe import (
        pad_stripe2d_entry,
        production_prefix_weights,
        quantize_prefix_weights,
        rdb_stripe2d_padded,
        unpad_stripe2d_exit,
    )

    nf, gc = 16, 8
    rdb, ws, bs = _one_rdb(nf, gc)
    ws = production_prefix_weights(ws)
    qws, sws = quantize_prefix_weights(ws)
    x = jnp.asarray(rng.random((1, 64, 96, nf)).astype(np.float32))
    ref = np.asarray(_rdb_apply(rdb, x))
    xp = pad_stripe2d_entry(x, block_h=32, block_w=48)
    outp = rdb_stripe2d_padded(
        xp, qws, bs, frame_h=64, frame_w=96, block_h=32, block_w=48,
        sws=sws, interpret=True,
    )
    out = np.asarray(
        unpad_stripe2d_exit(outp, 64, 96, nf, block_h=32, block_w=48)
    )
    assert _psnr(out, ref) > 50.0
    # chainable padded form: pad regions stay exact zeros
    full = np.array(outp)
    body = full[:, 32 : 32 + 64, :96, :nf].copy()
    full[:, 32 : 32 + 64, :96, :nf] = 0.0
    assert np.all(full == 0.0)
    np.testing.assert_allclose(body, out)


def test_rdb_stripe2d_split_int8_interpret(rng):
    """Split edge/interior launches with int8: identical values to the
    single-call quant kernel (same quant math, same chunk boundaries)."""
    from video_restore_tpu.ops.pallas_stripe import (
        pad_stripe2d_entry,
        production_prefix_weights,
        quantize_prefix_weights,
        rdb_stripe2d_padded,
        rdb_stripe2d_split,
        stripe2d_split_ok,
        unpad_stripe2d_exit,
    )

    nf, gc = 16, 8
    rdb, ws, bs = _one_rdb(nf, gc)
    ws = production_prefix_weights(ws)
    qws, sws = quantize_prefix_weights(ws)
    x = jnp.asarray(rng.random((1, 96, 144, nf)).astype(np.float32))
    assert stripe2d_split_ok(96, 144, 32, 48)
    xp = pad_stripe2d_entry(x, block_h=32, block_w=48)
    kw = dict(frame_h=96, frame_w=144, block_h=32, block_w=48, sws=sws,
              interpret=True)
    a = rdb_stripe2d_padded(xp, qws, bs, **kw)
    b = rdb_stripe2d_split(xp, qws, bs, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
    # and the res-fused split form against the naive residual
    ref = np.asarray(x + 0.2 * _rdb_apply(rdb, x))
    r = rdb_stripe2d_split(a * 0 + xp, qws, bs, x0=xp, res=True, **kw)
    got = np.asarray(
        unpad_stripe2d_exit(r, 96, 144, nf, block_h=32, block_w=48)
    )
    assert _psnr(got, ref) > 50.0


def test_rdb_stripe2d_int8_static_interpret(rng):
    """Static-A8 int8 (calibrated per-conv scales, quantize-once at the
    conv input — the round-5 repair path for the dynamic-quant chain
    cost) vs the fp32 naive RDB: same PSNR class as the dynamic form,
    the padded-form zero invariant holds, and the split launches are
    bitwise-identical to the single-call kernel (same quant math)."""
    from video_restore_tpu.models.rrdbnet import calibrate_rdb_act_scales
    from video_restore_tpu.ops.pallas_stripe import (
        pad_stripe2d_entry,
        production_prefix_weights,
        quantize_prefix_weights,
        rdb_stripe2d_padded,
        rdb_stripe2d_split,
        stripe2d_split_ok,
        unpad_stripe2d_exit,
    )

    nf, gc = 16, 8
    rdb, ws, bs = _one_rdb(nf, gc)
    x = jnp.asarray(rng.random((1, 96, 144, nf)).astype(np.float32))
    sas = calibrate_rdb_act_scales(rdb, x)
    assert len(sas) == 5 and all(isinstance(s, float) for s in sas)
    ws = production_prefix_weights(ws)
    qws, sws = quantize_prefix_weights(ws)
    ref = np.asarray(_rdb_apply(rdb, x))
    assert stripe2d_split_ok(96, 144, 32, 48)
    xp = pad_stripe2d_entry(x, block_h=32, block_w=48)
    kw = dict(frame_h=96, frame_w=144, block_h=32, block_w=48, sws=sws,
              sas=sas, interpret=True)
    outp = rdb_stripe2d_padded(xp, qws, bs, **kw)
    out = np.asarray(
        unpad_stripe2d_exit(outp, 96, 144, nf, block_h=32, block_w=48)
    )
    assert _psnr(out, ref) > 45.0
    # chainable padded form: pad regions stay exact zeros
    full = np.array(outp)
    full[:, 32 : 32 + 96, :144, :nf] = 0.0
    assert np.all(full == 0.0)
    # split launches: identical values to the single-call static kernel
    outs = rdb_stripe2d_split(xp, qws, bs, **kw)
    np.testing.assert_allclose(
        np.asarray(outp), np.asarray(outs), rtol=0, atol=0
    )


def test_full_model_stripe_int8_interpret(rng):
    """_apply(stripe=True, precision='int8') end to end (interpret):
    quality within a few tenths of a dB of the bf16 stripe path at this
    depth, exercising the in-jit _quantize_stripe_body over the scan-
    stacked body leaves."""
    from unittest import mock

    import video_restore_tpu.ops.pallas_stripe as pk
    from video_restore_tpu.models.rrdbnet import _apply, apply_rrdbnet

    spec = RRDBNetSpec(num_feat=16, num_block=2, num_grow_ch=8, scale=4)
    params = init_rrdbnet(jax.random.PRNGKey(1), spec)
    x = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    ref = np.asarray(apply_rrdbnet(params, x, spec, use_pallas=False))

    orig1 = pk.rdb_stripe_padded
    orig2 = pk.rdb_res_stripe_padded

    def interp1(xx, ws, bs, **kw):
        kw["interpret"] = True
        return orig1(xx, ws, bs, **kw)

    def interp2(xx, x0, ws, bs, **kw):
        kw["interpret"] = True
        return orig2(xx, x0, ws, bs, **kw)

    with mock.patch.object(
        pk, "rdb_stripe_padded", interp1
    ), mock.patch.object(pk, "rdb_res_stripe_padded", interp2):
        out = np.asarray(
            _apply(params, x, spec.scale, stripe=True, precision="int8")
        )
    assert out.shape == ref.shape
    assert _psnr(out, ref) > 45.0


def test_quant_act_bitwise_rounding():
    """_quant_act's bf16 rounding is BITWISE copysign(0.5) + truncate
    (arith.cmpf on bf16 vectors does not legalize in Mosaic — round-5
    compile record). Pin it against a numpy round-half-away reference on
    a value grid that covers negative halves, zero, the clip bounds, and
    values exactly representable in bf16."""
    from video_restore_tpu.ops.pallas_stripe import _quant_act

    # exact-in-bf16 grid: integers and halves across the int8 range,
    # plus a max value that sets the dynamic scale to exactly 1.0
    vals = np.concatenate(
        [
            np.arange(-127, 128, dtype=np.float32),
            np.arange(-126, 127, dtype=np.float32) + 0.5,
            np.array([-127.0, 127.0], np.float32),
        ]
    )
    n = vals.size
    pad = (-n) % 8
    vals = np.pad(vals, (0, pad))
    ak = jnp.asarray(vals.reshape(1, -1, 8), jnp.bfloat16)
    q, sa = jax.jit(_quant_act)(ak)
    assert q.dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(sa), 1.0, rtol=1e-6)
    got = np.asarray(q, np.int32).reshape(-1)[:n]
    v = vals[:n]
    # round-half-away reference (np.round is half-even; build explicitly)
    ref = np.trunc(v + np.copysign(0.5, v)).astype(np.int32)
    ref = np.clip(ref, -127, 127)
    np.testing.assert_array_equal(got, ref)

    # fp32 input takes the cmp branch and must agree on the same grid
    q32, sa32 = jax.jit(_quant_act)(jnp.asarray(vals.reshape(1, -1, 8)))
    np.testing.assert_array_equal(
        np.asarray(q32, np.int32).reshape(-1)[:n], ref
    )
