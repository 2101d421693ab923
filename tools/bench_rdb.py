"""Micro-benchmark: one RDB layer, XLA paths vs Pallas kernels, on the
flagship body shape (tile chunk (B, 384, 504, 64) bf16).

Chains iterations through a data dependency (output feeds input) and syncs
via a tiny D2H slice — the tunnel-safe timing idiom from bench.py. Weights
are passed as jit ARGUMENTS (closure-captured arrays become embedded
constants, which sends XLA into minutes of compile-time constant folding
on the CPU Eigen pool).

Usage: python tools/bench_rdb.py [accum|regroup|stripe:BH|old64] ...
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

from video_restore_tpu.models.rrdbnet import (
    RRDBNetSpec,
    _accum_rdb_weights,
    _rdb_apply_accum,
    _rdb_apply_regrouped,
    _regroup_rdb_weights,
    init_rrdbnet,
)
from video_restore_tpu.ops.pallas_stripe import prefix_rdb_weights, rdb_stripe

B, H, W, NF, GC = 4, 384, 504, 64, 32
REPS = 23  # RDB applications per timed step (one 23-block model's rdb1s)


def bench(name, step, x, wargs, iters=6, shape=None):
    bb, hh, ww = shape or (B, H, W)
    t0 = time.time()
    y = step(x, wargs)
    np.asarray(y[0, :1, :1, :1])  # compile + settle
    print(f"{name:>14}: compiled in {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    for _ in range(iters):
        y = step(y, wargs)
    np.asarray(y[0, :1, :1, :1])
    dt = (time.time() - t0) / (iters * REPS)
    macs = 2 * 9 * hh * ww * (  # 3x3 taps x per-pixel cin*cout sums
        NF * (NF + 4 * GC)
        + GC * ((NF + 3 * GC) + (NF + 2 * GC) + (NF + GC) + NF)
    )
    tf = bb * macs / dt / 1e12
    print(
        f"{name:>14}: {dt*1e3:7.2f} ms/RDB-call  {tf:6.1f} TF/s "
        f"(useful, {bb}x{hh}x{ww})",
        flush=True,
    )


def main():
    global REPS
    modes = sys.argv[1:] or ["accum", "stripe:64"]
    spec = RRDBNetSpec(num_feat=NF, num_block=1, num_grow_ch=GC)
    params = init_rrdbnet(jax.random.PRNGKey(0), spec)
    rdb = jax.tree.map(lambda a: a[0], params["body"]["rdb1"])
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, H, W, NF)), jnp.bfloat16)

    for mode in modes:
        if mode == "accum":
            ws, bs = _accum_rdb_weights(rdb, NF, GC)
            tp = {
                "w": tuple(jnp.asarray(w, jnp.bfloat16) for w in ws),
                "b": tuple(bs),
            }

            @jax.jit
            def step(x, tp):
                def body(h, _):
                    return _rdb_apply_accum(tp, h), None

                return lax.scan(body, x, None, length=REPS)[0]

            bench(mode, step, x, tp)

        elif mode == "regroup":
            ws, bs = _regroup_rdb_weights(rdb, NF, GC)
            tp = {
                "w": tuple(jnp.asarray(w, jnp.bfloat16) for w in ws),
                "b": tuple(bs),
            }

            @jax.jit
            def step(x, tp):
                def body(h, _):
                    return _rdb_apply_regrouped(tp, h), None

                return lax.scan(body, x, None, length=REPS)[0]

            bench(mode, step, x, tp)

        elif mode.startswith("stripei"):
            # stripei:BH[:sources] — im2col contraction (K = 9cin, dx
            # folded into K; no fp32 partial rolls) for the selected
            # source convs (default: all five)
            from video_restore_tpu.ops.pallas_stripe import (
                im2col_prefix_weights,
            )

            parts = mode.split(":")
            bh = int(parts[1]) if len(parts) > 1 else 64
            sel = (
                tuple(int(c) for c in parts[2])
                if len(parts) > 2
                else (0, 1, 2, 3, 4)
            )
            ws, bs = prefix_rdb_weights(rdb, NF, GC)
            ws = im2col_prefix_weights(ws, sel)
            wb = (
                tuple(jnp.asarray(w, jnp.bfloat16) for w in ws),
                tuple(jnp.asarray(b) for b in bs),
            )

            @jax.jit
            def step(x, wb, bh=bh):
                def body(h, _):
                    return (
                        rdb_stripe(h, wb[0], wb[1], block_h=bh),
                        None,
                    )

                return lax.scan(body, x, None, length=REPS)[0]

            bench(mode, step, x, wb)

        elif mode.startswith("stripepd"):
            # stripepd:BH — the production padded full-width chain
            # (pad_stripe_entry + rdb_stripe_padded), the fair baseline
            # for the s2d padded modes
            from video_restore_tpu.ops.pallas_stripe import (
                pad_stripe_entry,
                production_prefix_weights,
                rdb_stripe_padded,
            )

            parts = mode.split(":")
            bh = int(parts[1]) if len(parts) > 1 else 64
            ws, bs = prefix_rdb_weights(rdb, NF, GC)
            ws = production_prefix_weights(ws)
            wb = (
                tuple(jnp.asarray(w, jnp.bfloat16) for w in ws),
                tuple(jnp.asarray(b) for b in bs),
            )
            xp = pad_stripe_entry(
                jnp.asarray(x, jnp.bfloat16), block_h=bh
            )

            @jax.jit
            def step(xp, wb, bh=bh):
                def body(h, _):
                    return (
                        rdb_stripe_padded(
                            h, wb[0], wb[1],
                            frame_h=H, frame_w=W, block_h=bh,
                        ),
                        None,
                    )

                return lax.scan(body, xp, None, length=REPS)[0]

            bench(mode, step, xp, wb)

        elif mode.startswith("s2d"):
            # s2d:BH:BW[:H:W:B] — 2D-blocked padded chain (full-frame
            # candidate); TF/s is on USEFUL frame MACs, so halo/pad
            # overhead shows up as lost throughput (comparable numbers)
            from video_restore_tpu.ops.pallas_stripe import (
                pad_stripe2d_entry,
                production_prefix_weights,
                rdb_stripe2d_padded,
            )

            parts = mode.split(":")
            bh, bw = int(parts[1]), int(parts[2])
            hh = int(parts[3]) if len(parts) > 3 else H
            ww = int(parts[4]) if len(parts) > 4 else W
            bb = int(parts[5]) if len(parts) > 5 else B
            ws, bs = prefix_rdb_weights(rdb, NF, GC)
            ws = production_prefix_weights(ws)
            wb = (
                tuple(jnp.asarray(w, jnp.bfloat16) for w in ws),
                tuple(jnp.asarray(b) for b in bs),
            )
            x2 = jnp.asarray(rng.random((bb, hh, ww, NF)), jnp.bfloat16)
            xp = pad_stripe2d_entry(x2, block_h=bh, block_w=bw)

            @jax.jit
            def step(xp, wb, bh=bh, bw=bw, hh=hh, ww=ww):
                def body(h, _):
                    return (
                        rdb_stripe2d_padded(
                            h, wb[0], wb[1],
                            frame_h=hh, frame_w=ww,
                            block_h=bh, block_w=bw,
                        ),
                        None,
                    )

                return lax.scan(body, xp, None, length=REPS)[0]

            bench(mode, step, xp, wb, shape=(bb, hh, ww))

        elif mode.startswith("s2s") or mode.startswith("s2q"):
            # s2s:BH:BW[:H:W:B] — split edge/interior launches (masked
            # ring in two calls, mask-free interior in a third);
            # s2q:BH:BW — the same launches with the int8 W8A8 body
            # (quantize_prefix_weights + in-kernel dynamic activation
            # scales); s2qs:BH:BW — static-A8: calibrated per-conv
            # activation scales (quantize-once, no in-kernel amax chain)
            from video_restore_tpu.ops.pallas_stripe import (
                pad_stripe2d_entry,
                production_prefix_weights,
                quantize_prefix_weights,
                rdb_stripe2d_split,
                stripe2d_split_ok,
            )

            parts = mode.split(":")
            quant = mode.startswith("s2q")
            static_q = mode.startswith("s2qs")
            bh, bw = int(parts[1]), int(parts[2])
            hh = int(parts[3]) if len(parts) > 3 else H
            ww = int(parts[4]) if len(parts) > 4 else W
            bb = int(parts[5]) if len(parts) > 5 else B
            assert stripe2d_split_ok(hh, ww, bh, bw), "no interior"
            ws, bs = prefix_rdb_weights(rdb, NF, GC)
            ws = production_prefix_weights(ws)
            if quant:
                qws, sws = quantize_prefix_weights(ws)
                wb = (
                    tuple(qws),
                    tuple(jnp.asarray(b) for b in bs),
                    tuple(sws),
                )
            else:
                wb = (
                    tuple(jnp.asarray(w, jnp.bfloat16) for w in ws),
                    tuple(jnp.asarray(b) for b in bs),
                    None,
                )
            x2 = jnp.asarray(rng.random((bb, hh, ww, NF)), jnp.bfloat16)
            xp = pad_stripe2d_entry(x2, block_h=bh, block_w=bw)
            if static_q:
                from video_restore_tpu.models.rrdbnet import (
                    calibrate_rdb_act_scales,
                )

                # calibrate on a small crop of the bench input (values
                # only set the clip point — timing is scale-invariant)
                sas = calibrate_rdb_act_scales(
                    rdb, x2[:1, :128, :128].astype(jnp.float32)
                )
            else:
                sas = None

            @jax.jit
            def step(xp, wb, bh=bh, bw=bw, hh=hh, ww=ww, sas=sas):
                def body(h, _):
                    return (
                        rdb_stripe2d_split(
                            h, wb[0], wb[1], sws=wb[2], sas=sas,
                            frame_h=hh, frame_w=ww,
                            block_h=bh, block_w=bw,
                        ),
                        None,
                    )

                return lax.scan(body, xp, None, length=REPS)[0]

            bench(mode, step, xp, wb, shape=(bb, hh, ww))

        elif mode.startswith("stripem"):
            # stripem:BH:PACK:IM2 — mixed contraction: N-pack the PACK
            # sources, im2col the IM2 sources (e.g. stripem:64:014:23 is
            # the production_prefix_weights candidate mix)
            from video_restore_tpu.ops.pallas_stripe import (
                im2col_prefix_weights,
                pack_prefix_weights,
            )

            parts = mode.split(":")
            bh = int(parts[1]) if len(parts) > 1 else 64
            pack = tuple(int(c) for c in parts[2]) if len(parts) > 2 else (0, 1, 4)
            im2 = tuple(int(c) for c in parts[3]) if len(parts) > 3 else (2, 3)
            ws, bs = prefix_rdb_weights(rdb, NF, GC)
            ws = im2col_prefix_weights(pack_prefix_weights(ws, pack), im2)
            wb = (
                tuple(jnp.asarray(w, jnp.bfloat16) for w in ws),
                tuple(jnp.asarray(b) for b in bs),
            )

            @jax.jit
            def step(x, wb, bh=bh):
                def body(h, _):
                    return (
                        rdb_stripe(h, wb[0], wb[1], block_h=bh),
                        None,
                    )

                return lax.scan(body, x, None, length=REPS)[0]

            bench(mode, step, x, wb)

        elif mode.startswith("stripep"):
            # stripep:BH[:s0s1s4] — N-packed dx contraction (one
            # (M,K)x(K,3N) matmul + slice/roll/add per packed conv);
            # stripep16:BH runs the same with a bf16 accumulator (halves
            # the fp32 accumulator VMEM, the bh=96 blocker)
            from video_restore_tpu.ops.pallas_stripe import (
                NPACK_DEFAULT,
                pack_prefix_weights,
            )

            parts = mode.split(":")
            a16 = mode.startswith("stripep16")
            bh = int(parts[1]) if len(parts) > 1 else 64
            pack = (
                tuple(int(c) for c in parts[2])
                if len(parts) > 2
                else NPACK_DEFAULT
            )
            ws, bs = prefix_rdb_weights(rdb, NF, GC)
            ws = pack_prefix_weights(ws, pack)
            wb = (
                tuple(jnp.asarray(w, jnp.bfloat16) for w in ws),
                tuple(jnp.asarray(b) for b in bs),
            )

            @jax.jit
            def step(x, wb, bh=bh, a16=a16):
                def body(h, _):
                    return (
                        rdb_stripe(
                            h, wb[0], wb[1], block_h=bh, acc_bf16=a16
                        ),
                        None,
                    )

                return lax.scan(body, x, None, length=REPS)[0]

            bench(mode, step, x, wb)

        elif mode.startswith("stripe"):
            # stripe:BH (fp32 accumulator) or stripe16:BH (bf16 acc)
            bh = int(mode.split(":")[1]) if ":" in mode else 64
            a16 = mode.startswith("stripe16")
            ws, bs = prefix_rdb_weights(rdb, NF, GC)
            wb = (
                tuple(jnp.asarray(w, jnp.bfloat16) for w in ws),
                tuple(jnp.asarray(b) for b in bs),
            )

            @jax.jit
            def step(x, wb, bh=bh, a16=a16):
                def body(h, _):
                    return (
                        rdb_stripe(
                            h, wb[0], wb[1], block_h=bh, acc_bf16=a16
                        ),
                        None,
                    )

                return lax.scan(body, x, None, length=REPS)[0]

            bench(mode, step, x, wb)

        elif mode.startswith("rrdbp"):
            # rrdbp:BH — whole-RRDB fused kernel with N-packed convs
            # (VERDICT r2 item #9: the packed form runs 9 matmuls per RDB
            # instead of 15, which may duck the Mosaic compile cliff that
            # stalled the unpacked 3-RDB kernel >25min)
            from video_restore_tpu.ops.pallas_stripe import (
                pack_prefix_weights,
                pad_stripe_entry,
                rrdb_stripe_padded,
                unpad_stripe_exit,
            )

            bh = int(mode.split(":")[1]) if ":" in mode else 48
            ws, bs = prefix_rdb_weights(rdb, NF, GC)
            ws = pack_prefix_weights(ws)
            wb = (
                tuple(jnp.asarray(w, jnp.bfloat16) for w in ws) * 3,
                tuple(jnp.asarray(b) for b in bs) * 3,
            )
            nreps = -(-REPS // 3)

            @jax.jit
            def step(x, wb, bh=bh, nreps=nreps):
                xp = pad_stripe_entry(x, block_h=bh, fused=True)

                def body(hc, _):
                    return (
                        rrdb_stripe_padded(
                            hc, wb[0], wb[1],
                            frame_h=H, frame_w=W, block_h=bh,
                        ),
                        None,
                    )

                xp = lax.scan(body, xp, None, length=nreps)[0]
                return unpad_stripe_exit(
                    xp, H, W, NF, block_h=bh, fused=True
                )

            saved, REPS = REPS, nreps * 3
            bench(mode, step, x, wb)
            REPS = saved

        elif mode.startswith("rrdb"):
            # rrdb:BH — whole-RRDB fused kernel in padded stripe form;
            # REPS scans one RRDB (3 RDB-equivalents) per rep, normalized
            # to ms/RDB-call for comparison
            from video_restore_tpu.ops.pallas_stripe import (
                pad_stripe_entry,
                rrdb_stripe_padded,
                unpad_stripe_exit,
            )

            bh = int(mode.split(":")[1]) if ":" in mode else 48
            ws, bs = prefix_rdb_weights(rdb, NF, GC)
            wb = (
                tuple(jnp.asarray(w, jnp.bfloat16) for w in ws) * 3,
                tuple(jnp.asarray(b) for b in bs) * 3,
            )
            nreps = -(-REPS // 3)

            @jax.jit
            def step(x, wb, bh=bh, nreps=nreps):
                xp = pad_stripe_entry(x, block_h=bh, fused=True)

                def body(hc, _):
                    return (
                        rrdb_stripe_padded(
                            hc, wb[0], wb[1],
                            frame_h=H, frame_w=W, block_h=bh,
                        ),
                        None,
                    )

                xp = lax.scan(body, xp, None, length=nreps)[0]
                return unpad_stripe_exit(
                    xp, H, W, NF, block_h=bh, fused=True
                )

            saved, REPS = REPS, nreps * 3
            bench(mode, step, x, wb)
            REPS = saved

        elif mode == "old64":
            from video_restore_tpu.ops.pallas_rdb import rdb_fused

            ws, bs = _regroup_rdb_weights(rdb, NF, GC)
            wb = (
                tuple(jnp.asarray(w, jnp.bfloat16) for w in ws),
                tuple(jnp.asarray(b) for b in bs),
            )

            @jax.jit
            def step(x, wb):
                def body(h, _):
                    return rdb_fused(h, wb[0], wb[1]), None

                return lax.scan(body, x, None, length=REPS)[0]

            bench(mode, step, x, wb)
        else:
            raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
