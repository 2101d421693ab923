#!/usr/bin/env python
"""Precision A/B: golden-tile PSNR/SSIM of the int8 W8A8 stripe body vs
the bf16 production path and the fp32 reference (VERDICT r4 item 1's
quality leg — the fps leg is tools/bench_rdb.py s2q + bench.py under
VRT_PRECISION=int8).

Checkpoints: real released .pth files from --models-dir when present,
else the synthetic released-schema checkpoints (tools/golden_parity.py)
— same serialization, realistic magnitudes (basicsr 0.1 RDB init), but
note real-weight activation ranges can differ; re-run with real weights
on any egress-capable host for the binding number.

Default (CPU): the stripe kernels run in interpret mode via the same
mocks the test suite uses. --tpu runs the REAL kernel path on the chip
(first compile of the small geometry is minutes through the tunnel).

Usage::

    python tools/precision_ab.py                 # x4plus + anime, CPU
    python tools/precision_ab.py --models x4plus --size 48x64
    python tools/precision_ab.py --tpu --size 96x128
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
for p in (str(REPO), str(REPO / "tests"), str(REPO / "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)

MODELS = {
    "x4plus": "RealESRGAN_x4plus",
    "anime": "RealESRGAN_x4plus_anime_6B",
}


@contextlib.contextmanager
def _interpret_stripe():
    """Route every production stripe/tail kernel through interpret mode
    (the CPU validation idiom of tests/ and __graft_entry__)."""
    from unittest import mock

    import video_restore_tpu.ops.pallas_stripe as pk
    import video_restore_tpu.ops.pallas_tail as pt

    patches = []
    for modname, mod in (("pk", pk), ("pt", pt)):
        for n in (
            ("rdb_stripe_padded", "rdb_res_stripe_padded",
             "rdb_stripe2d_padded", "rdb_res_stripe2d_padded",
             "rdb_stripe2d_split")
            if mod is pk
            else ("conv3x3_fused", "up1_fused", "tail_fused",
                  "tail_fused_raw")
        ):
            orig = getattr(mod, n)

            def wrap(*a, _o=orig, **kw):
                kw["interpret"] = True
                return _o(*a, **kw)

            patches.append(mock.patch.object(mod, n, wrap))
    with contextlib.ExitStack() as st:
        for p in patches:
            st.enter_context(p)
        yield


def render(name: str, pth: Path, x: np.ndarray, precision: str,
           stripe: bool, interpret: bool) -> np.ndarray:
    import jax.numpy as jnp

    from video_restore_tpu.models.convert import convert_pth_to_params
    from video_restore_tpu.models.rrdbnet import _apply
    from video_restore_tpu.models.zoo import MODEL_ZOO

    spec = MODEL_ZOO[name].spec
    params = convert_pth_to_params(pth, name)
    if precision != "fp32":
        import jax

        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            params,
        )
    ctx = _interpret_stripe() if (stripe and interpret) else contextlib.nullcontext()
    with ctx:
        y = _apply(
            params, jnp.asarray(x), spec.scale,
            stripe=stripe, unshuffle=spec.unshuffle,
            precision="int8" if precision == "int8" else "bf16",
        )
        y = np.asarray(y, np.float32)
    return y


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="*", default=list(MODELS),
                    choices=list(MODELS))
    ap.add_argument("--models-dir", default="models")
    ap.add_argument("--size", default="24x32",
                    help="golden tile HxW (LR)")
    ap.add_argument("--tiles", type=int, default=2)
    ap.add_argument("--tpu", action="store_true",
                    help="run the real kernel path on the TPU")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        cache = os.environ.get(
            "VRT_XLA_CACHE",
            os.path.expanduser("~/.cache/video_restore_tpu/xla"),
        )
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )

    from golden_parity import _scores, golden_tiles, synthetic_sr_checkpoint
    from video_restore_tpu.models.zoo import MODEL_ZOO

    h, w = (int(v) for v in args.size.lower().split("x"))
    x = golden_tiles(n=args.tiles, h=h, w=w)

    rows = []
    with tempfile.TemporaryDirectory() as td:
        for key in args.models:
            name = MODELS[key]
            real = Path(args.models_dir) / MODEL_ZOO[name].pth_name
            if real.exists():
                pth, src = real, "real"
            else:
                pth, src = synthetic_sr_checkpoint(name, Path(td)), "synthetic"

            ref = render(name, pth, x, "fp32", stripe=False, interpret=False)
            bf16 = render(name, pth, x, "bf16", stripe=True,
                          interpret=not args.tpu)
            i8 = render(name, pth, x, "int8", stripe=True,
                        interpret=not args.tpu)

            p_b, s_b = _scores(bf16, ref)
            p_i, s_i = _scores(i8, ref)
            p_ib, s_ib = _scores(i8, bf16)
            row = {
                "model": name, "weights": src, "lr": f"{h}x{w}",
                "path": "tpu" if args.tpu else "interpret",
                "bf16_vs_fp32": {"psnr": round(p_b, 2), "ssim": round(s_b, 4)},
                "int8_vs_fp32": {"psnr": round(p_i, 2), "ssim": round(s_i, 4)},
                "int8_vs_bf16": {"psnr": round(p_ib, 2), "ssim": round(s_ib, 4)},
                "int8_delta_psnr_db": round(p_i - p_b, 2),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
