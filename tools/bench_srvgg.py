"""Micro-benchmark: the SRVGG 32-conv body, full-width vs 2D-blocked
stripe kernels, at the config-4 production shape (1080p, nf=64).

Timing idiom matches tools/bench_rdb.py (data-dependency chained scan +
tiny D2H sync). TF/s is on USEFUL frame MACs so halo/margin/pad overhead
shows up as lost throughput.

Usage: python tools/bench_srvgg.py [fw[:GROUP]|s2d:BH:BW[:GROUP]] ...
  with VRT_SRVGG_KFORM={roll|pack|im2col} selecting the contraction form.
  s2q:BH:BW = the int8 W8A8 2D body; s2p:BH:BW = split edge/interior
  launches (mask-free interior) of the bf16 2D body.
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

from video_restore_tpu.models.srvgg import SRVGGSpec, _stripe_kform, init_srvgg
from video_restore_tpu.ops.pallas_srvgg import (
    fold_dy,
    srvgg_stripe2d_padded,
    srvgg_stripe2d_split,
    srvgg_stripe_padded,
)
from video_restore_tpu.ops.pallas_stripe import (
    pad_stripe2d_entry,
    pad_stripe_entry,
    unpad_stripe2d_exit,
    unpad_stripe_exit,
)

B, H, W, NF, NCONV = 1, 1080, 1920, 64, 32
ITERS = 8


def kform_weights(wsg, ngroups, g, nf, two_d=False):
    # two_d must mirror the production default (_stripe_kform(two_d=
    # blocks is not None) in models/srvgg.py) — the 2D body defaults to
    # the N-packed form, the full-width stripe to roll.
    kform = _stripe_kform(two_d=two_d)
    if kform == "im2col":
        return wsg.reshape(ngroups, g, 9 * nf, nf)
    if kform == "pack":
        return jnp.swapaxes(wsg, -3, -2).reshape(ngroups, g, 3 * nf, 3 * nf)
    return wsg.reshape(ngroups, g, 3, 3 * nf, nf)


def bench(name, step, x, wargs):
    t0 = time.time()
    y = step(x, wargs)
    np.asarray(y[0, :1, :1, :1])
    print(f"{name:>16}: compiled in {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    for _ in range(ITERS):
        y = step(y, wargs)
    np.asarray(y[0, :1, :1, :1])
    dt = (time.time() - t0) / ITERS
    macs = 2 * 9 * H * W * NF * NF * NCONV
    print(
        f"{name:>16}: {dt*1e3:7.2f} ms/body  "
        f"{B * macs / dt / 1e12:6.1f} TF/s (useful, {B}x{H}x{W})",
        flush=True,
    )


def main():
    spec = SRVGGSpec(num_feat=NF, num_conv=NCONV)
    params = init_srvgg(jax.random.PRNGKey(0), spec)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, H, W, NF)), jnp.bfloat16)
    wall = fold_dy(params["body"]["w"])

    for mode in sys.argv[1:] or ["fw:8"]:
        parts = mode.split(":")
        if mode.startswith("fw"):
            g = int(parts[1]) if len(parts) > 1 else 8
            ngroups = NCONV // g
            wsg = kform_weights(wall, ngroups, g, NF)
            bsg = params["body"]["b"].reshape(ngroups, g, NF)
            asg = params["body"]["alpha"].reshape(ngroups, g, NF)
            wb = (
                jnp.asarray(wsg, jnp.bfloat16),
                jnp.asarray(bsg),
                jnp.asarray(asg),
            )

            @jax.jit
            def step(x, wb, g=g):
                xp = pad_stripe_entry(x)

                def gstep(hc, gw):
                    return (
                        srvgg_stripe_padded(
                            hc, gw[0], gw[1], gw[2],
                            frame_h=H, frame_w=W, group=g,
                        ),
                        None,
                    )

                xp, _ = lax.scan(gstep, xp, wb)
                return unpad_stripe_exit(xp, H, W, NF)

            bench(mode, step, x, wb)

        elif (
            mode.startswith("s2d")
            or mode.startswith("s2q")
            or mode.startswith("s2p")
        ):
            # s2q:BH:BW[:G] — the 2D body with the int8 W8A8 path;
            # s2p:BH:BW[:G] — split edge/interior launches
            bh, bw = int(parts[1]), int(parts[2])
            g = int(parts[3]) if len(parts) > 3 else 8
            quant = mode.startswith("s2q")
            body2d = (
                srvgg_stripe2d_split
                if mode.startswith("s2p")
                else srvgg_stripe2d_padded
            )
            ngroups = NCONV // g
            wsg = kform_weights(wall, ngroups, g, NF, two_d=True)
            bsg = params["body"]["b"].reshape(ngroups, g, NF)
            asg = params["body"]["alpha"].reshape(ngroups, g, NF)
            if quant:
                from video_restore_tpu.ops.pallas_stripe import (
                    quantize_prefix_weights,
                )

                (qw,), (sw,) = quantize_prefix_weights((wsg,))
                wb = (qw, jnp.asarray(bsg), jnp.asarray(asg), sw)
            else:
                wb = (
                    jnp.asarray(wsg, jnp.bfloat16),
                    jnp.asarray(bsg),
                    jnp.asarray(asg),
                    None,
                )

            @jax.jit
            def step(x, wb, g=g, bh=bh, bw=bw, body2d=body2d):
                xp = pad_stripe2d_entry(x, block_h=bh, block_w=bw)

                def gstep(hc, gw):
                    return (
                        body2d(
                            hc, gw[0], gw[1], gw[2], sws=gw[3],
                            frame_h=H, frame_w=W, group=g,
                            block_h=bh, block_w=bw,
                        ),
                        None,
                    )

                xp, _ = lax.scan(gstep, xp, wb)
                return unpad_stripe2d_exit(xp, H, W, NF, block_h=bh, block_w=bw)

            bench(mode, step, x, wb)
        else:
            raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
