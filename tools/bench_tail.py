"""Micro-benchmark: RRDBNet tail variants (upconv2x -> conv_hr ->
conv_last) on the flagship body shape (4, 384, 504, 64) bf16 -> 4K RGB.

Variants:
  ct    — production: conv_transpose upconv (ops/conv.py upconv2x)
  sd    — phase-form upconv: one (3,3,64,256) conv at the input grid +
          pixel_shuffle (standard NHWC layouts end-to-end)
  sdlast— sd upconv + conv_hr fine + conv_last computed in the sd domain
          (pixel_unshuffle -> (3,3,256,12) sd kernels -> shuffle)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_tail.py [ct sd ...]
"""

import os
import sys
import time

import jax
import numpy as np

cache = os.environ.get(
    "VRT_XLA_CACHE", os.path.expanduser("~/.cache/video_restore_tpu/xla")
)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import lax

from video_restore_tpu.ops.conv import (
    conv2d,
    leaky_relu,
    pixel_shuffle,
    upconv2x,
)

B, H, W, NF = 4, 384, 504, 64
REPS = 4


def up_phase_kernel(w):
    """(3,3,cin,cout) fine upconv kernel -> (3,3,cin,4*cout) phase-form
    kernel at the INPUT grid: channel (o, a, b) = fine output phase.
    Row combos per phase (nearest-up + SAME 3x3): a=0 reads rows
    {i-1: w0, i: w1+w2}; a=1 reads {i: w0+w1, i+1: w2}."""
    m = np.zeros((2, 3, 3), np.float32)  # (phase, row-offset u, tap ky)
    m[0, 0, 0] = 1.0
    m[0, 1, 1] = m[0, 1, 2] = 1.0
    m[1, 1, 0] = m[1, 1, 1] = 1.0
    m[1, 2, 2] = 1.0
    mj = jnp.asarray(m)
    # K[u,v,c,(o,a,b)] = sum_{ky,kx} m[a,u,ky] m[b,v,kx] w[ky,kx,c,o]
    k = jnp.einsum("auy,bvx,yxco->uvcoab", mj, mj, w.astype(jnp.float32))
    kh, kw, cin, cout = w.shape
    return k.reshape(3, 3, cin, cout * 4).astype(w.dtype)


def upconv2x_phase(x, w, b):
    k = up_phase_kernel(w)
    y = conv2d(x, k)  # (B, H, W, 4*cout), channels (o, a, b)
    y = pixel_shuffle(y, 2)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype)


def main():
    modes = sys.argv[1:] or ["ct", "sd"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, H, W, NF)), jnp.bfloat16)

    def mk(shape):
        return jnp.asarray(rng.random(shape) * 0.1, jnp.bfloat16)

    wu1, bu1 = mk((3, 3, NF, NF)), mk((NF,))
    wu2, bu2 = mk((3, 3, NF, NF)), mk((NF,))
    whr, bhr = mk((3, 3, NF, NF)), mk((NF,))
    wl, bl = mk((3, 3, NF, 3)), mk((3,))
    wargs = (wu1, bu1, wu2, bu2, whr, bhr, wl, bl)

    def tail_ct(x, w):
        wu1, bu1, wu2, bu2, whr, bhr, wl, bl = w
        f = leaky_relu(upconv2x(x, wu1, bu1))
        f = leaky_relu(upconv2x(f, wu2, bu2))
        f = leaky_relu(conv2d(f, whr, bhr))
        return conv2d(f, wl, bl)

    def tail_sd(x, w):
        wu1, bu1, wu2, bu2, whr, bhr, wl, bl = w
        f = leaky_relu(upconv2x_phase(x, wu1, bu1))
        f = leaky_relu(upconv2x_phase(f, wu2, bu2))
        f = leaky_relu(conv2d(f, whr, bhr))
        return conv2d(f, wl, bl)

    def tail_sdt(x, w):
        # sd-throughout (VERDICT r2 item #2): upconv1 phase-major + ONE
        # cheap coarse shuffle; upconv2 phase-major emits the 4x grid as
        # channel-packed sd at the 2x grid; conv_hr/conv_last run in the
        # sd domain; a single 12-channel pixel_shuffle at the RGB end.
        # The full-res fine tensors (and their 5-D conv_transpose
        # layouts) never exist.
        from video_restore_tpu.ops.conv import (
            pixel_shuffle_pm,
            up_phase_kernel_pm,
        )
        from video_restore_tpu.ops.sdconv import (
            conv3x3_sd_packed,
            make_sd_kernels,
        )

        wu1, bu1, wu2, bu2, whr, bhr, wl, bl = w
        y1 = leaky_relu(
            conv2d(x, up_phase_kernel_pm(wu1), jnp.tile(bu1, 4))
        )  # (B, H, W, 256) = sd of the 2x grid
        f1 = pixel_shuffle_pm(y1, 2)  # (B, 2H, 2W, 64) — one cheap shuffle
        y2 = leaky_relu(
            conv2d(f1, up_phase_kernel_pm(wu2), jnp.tile(bu2, 4))
        )  # (B, 2H, 2W, 256) = sd of the 4x grid; stays packed
        y3 = leaky_relu(
            conv3x3_sd_packed(y2, make_sd_kernels(whr), bhr)
        )  # (B, 2H, 2W, 256)
        y4 = conv3x3_sd_packed(y3, make_sd_kernels(wl), bl)  # (..., 12)
        return pixel_shuffle_pm(y4, 2)  # (B, 4H, 4W, 3)

    def tail_tk(x, w):
        # fused Pallas tail kernel (ops/pallas_tail.py): upconv1 in XLA,
        # then upconv2 + conv_hr + conv_last in one stripe kernel
        from video_restore_tpu.ops.pallas_tail import tail_fused

        wu1, bu1, wu2, bu2, whr, bhr, wl, bl = w
        f = leaky_relu(upconv2x(x, wu1, bu1))
        return tail_fused(f, wu2, bu2, whr, bhr, wl, bl)

    tails = {"ct": tail_ct, "sd": tail_sd, "sdt": tail_sdt, "tk": tail_tk}

    # numeric check (small, fp32)
    xs = jnp.asarray(rng.random((1, 16, 20, NF)), jnp.float32)
    ws32 = tuple(a.astype(jnp.float32) for a in wargs)
    ref = np.asarray(tail_ct(xs, ws32))
    got = np.asarray(tail_sd(xs, ws32))
    err = np.abs(ref - got).max()
    print(f"sd-vs-ct parity maxdiff: {err:.2e}")
    got_t = np.asarray(tail_sdt(xs, ws32))
    err_t = np.abs(ref - got_t).max()
    print(f"sdt-vs-ct parity maxdiff: {err_t:.2e}")

    for mode in modes:
        fn = tails[mode]

        @jax.jit
        def step(x, w, fn=fn):
            def body(c, _):
                y = fn(x, w)
                # fold the 4K RGB back to a carry-sized stat so reps chain
                return c + y[:, :H, :W, :1].astype(x.dtype), None

            return lax.scan(body, x[..., :1] * 0, None, length=REPS)[0]

        t0 = time.time()
        r = step(x, wargs)
        np.asarray(r[0, :1, :1])
        print(f"{mode}: compiled in {time.time()-t0:.0f}s", flush=True)
        t0 = time.time()
        iters = 5
        for _ in range(iters):
            r = r * 0 + step(x, wargs)[..., :1]
            np.asarray(r[0, :1, :1])
        dt = (time.time() - t0) / (iters * REPS)
        print(f"{mode}: {dt*1e3:7.2f} ms/tail-call", flush=True)


if __name__ == "__main__":
    main()
