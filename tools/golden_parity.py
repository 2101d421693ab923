#!/usr/bin/env python
"""Golden-weight parity harness: one command that proves checkpoint
conversion + the JAX forward reproduce the torch rendering, model by model.

The north-star bar is PSNR/SSIM parity vs the CUDA reference
(BASELINE.md), against the released checkpoints the reference downloads
(/root/reference/video_upscaler.py:344-348). This environment has zero
egress, so the harness runs in two modes:

- **Self-check (default, runs today)**: for each model a synthetic
  checkpoint with the released serialization schema (manifest keys/shapes,
  fixed numpy seed) is written as a real ``.pth``, pushed through the
  production load path (safe torch.load -> manifest validation ->
  conversion), and the JAX forward is compared on deterministic golden
  tiles against (a) an independent torch rendering of the same weights
  (tests/torch_ref.py / tests/torch_gfpgan_ref.py) and (b) the committed
  golden outputs in tests/goldens/ (drift tripwire for both
  implementations at once).
- **Real-weights mode (day one)**: drop the released ``.pth`` files into
  ``--models-dir`` and re-run. Any model whose checkpoint file is present
  is validated with the *real* weights — the torch cross-implementations
  are state_dict-compatible with the released files, so the comparison
  needs no network and no basicsr install. This is the one-command
  PSNR/SSIM parity check BASELINE.md calls for.

Pass bar: PSNR >= 45 dB and SSIM >= 0.99 on 8-bit-scaled outputs (fp32
forwards typically land > 60 dB; the margin absorbs torch-version conv
reassociation).

Usage::

    python tools/golden_parity.py                  # self-check all models
    python tools/golden_parity.py --models-dir models   # real weights
    python tools/golden_parity.py --regen-goldens  # refresh tests/goldens/
    make parity
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
for p in (str(REPO), str(REPO / "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)

GOLDEN_DIR = REPO / "tests" / "goldens"
PSNR_PASS = 45.0
SSIM_PASS = 0.99
GFPGAN_NAME = "GFPGANv1.4"


def golden_tiles(seed: int = 7, n: int = 2, h: int = 24, w: int = 32):
    """Deterministic structured-plus-noise input tiles in [0, 1]."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [xx / w, yy / h, (xx + yy) / (h + w)], -1
    ).astype(np.float32)
    tiles = []
    for i in range(n):
        t = base + 0.15 * np.sin(10.0 * base[..., :1] * (i + 1))
        t = t + rng.normal(0.0, 0.05, (h, w, 3))
        tiles.append(np.clip(t, 0.0, 1.0))
    return np.stack(tiles).astype(np.float32)


def _scores(ours: np.ndarray, ref: np.ndarray):
    """Min per-tile PSNR/SSIM on 8-bit scale. Both arrays are mapped to
    [0, 255] by the REFERENCE's dynamic range (no clipping): synthetic
    checkpoints can drive activations outside [0, 1], and clipping there
    would saturate both sides identically and hide real divergence."""
    from video_restore_tpu.metrics import frame_psnr, frame_ssim

    ref = np.asarray(ref, np.float64)
    ours = np.asarray(ours, np.float64)
    lo, hi = ref.min(), ref.max()
    span = max(hi - lo, 1.0)  # real weights: [0,1] -> the usual 255 scale
    a = (ours - lo) / span * 255.0
    b = (ref - lo) / span * 255.0
    psnr = min(frame_psnr(a[i], b[i]) for i in range(a.shape[0]))
    ssim = min(frame_ssim(a[i], b[i]) for i in range(a.shape[0]))
    return psnr, ssim


# ---------------------------------------------------------------------------
# SR models (the reference's zoo + BSRGAN)
# ---------------------------------------------------------------------------


def synthetic_sr_checkpoint(name: str, out_dir: Path) -> Path:
    """Write a .pth with exactly the released checkpoint's keys/shapes
    (fixed seed) so the production load path is exercised end to end."""
    import torch

    from video_restore_tpu.models.manifests import (
        CHECKPOINT_NEST_KEY,
        state_dict_manifest,
    )
    from video_restore_tpu.models.zoo import MODEL_ZOO

    import zlib

    manifest = state_dict_manifest(name)
    # stable per-model seed (Python's hash() is per-process randomized)
    rng = np.random.default_rng(zlib.crc32(name.encode()))
    sd = {}
    for k, shape in manifest.items():
        if k.endswith(".bias"):
            a = rng.normal(0.0, 0.01, shape)
        else:
            fan_in = int(np.prod(shape[1:])) or 1
            a = rng.normal(0.0, (2.0 / fan_in) ** 0.5, shape)
            # residual-dense convs in the released files carry basicsr's
            # 0.1 init scaling; keep magnitudes realistic
            if "rdb" in k.lower() or "RDB" in k:
                a = a * 0.1
        sd[k] = torch.from_numpy(a.astype(np.float32))
    nest = CHECKPOINT_NEST_KEY[name]
    ckpt = {nest: sd} if nest else sd
    path = out_dir / MODEL_ZOO[name].pth_name
    torch.save(ckpt, path)
    return path


def _esrgan_to_basicsr_keys(sd):
    """Inverse of tests/torch_ref.to_esrgan_keys: rename a released
    BSRGAN state_dict to the basicsr naming RRDBNetTorch uses."""
    out = {}
    for k, v in sd.items():
        k = (
            k.replace("trunk_conv", "conv_body")
            .replace("upconv1", "conv_up1")
            .replace("upconv2", "conv_up2")
            .replace("HRconv", "conv_hr")
        )
        if k.startswith("RRDB_trunk."):
            k = "body." + k[len("RRDB_trunk."):]
            k = k.replace(".RDB", ".rdb")
        out[k] = v
    return out


def torch_render_sr(name: str, pth_path: Path, x: np.ndarray) -> np.ndarray:
    import torch

    from torch_ref import RRDBNetTorch, SRVGGNetCompactTorch
    from video_restore_tpu.models.convert import _load_state_dict
    from video_restore_tpu.models.rrdbnet import RRDBNetSpec
    from video_restore_tpu.models.zoo import MODEL_ZOO

    spec = MODEL_ZOO[name].spec
    sd = {
        k: torch.from_numpy(np.asarray(v))
        for k, v in _load_state_dict(pth_path).items()
    }
    if isinstance(spec, RRDBNetSpec):
        if spec.key_style == "esrgan":
            sd = _esrgan_to_basicsr_keys(sd)
        tm = RRDBNetTorch(
            nf=spec.num_feat, nb=spec.num_block, gc=spec.num_grow_ch,
            scale=spec.scale, unshuffle=spec.unshuffle,
        )
    else:
        tm = SRVGGNetCompactTorch(
            nf=spec.num_feat, nc=spec.num_conv, upscale=spec.scale
        )
    tm.load_state_dict(sd)
    tm.eval()
    with torch.no_grad():
        y = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    return y.permute(0, 2, 3, 1).numpy()


def jax_render_sr(name: str, pth_path: Path, x: np.ndarray) -> np.ndarray:
    from video_restore_tpu.models.convert import convert_pth_to_params
    from video_restore_tpu.models.rrdbnet import RRDBNetSpec, apply_rrdbnet
    from video_restore_tpu.models.srvgg import apply_srvgg
    from video_restore_tpu.models.zoo import MODEL_ZOO

    import jax.numpy as jnp

    spec = MODEL_ZOO[name].spec
    params = convert_pth_to_params(pth_path, name)  # manifest-validated
    if isinstance(spec, RRDBNetSpec):
        y = apply_rrdbnet(params, jnp.asarray(x), spec)
    else:
        y = apply_srvgg(params, jnp.asarray(x), spec)
    return np.asarray(y)


# ---------------------------------------------------------------------------
# GFPGAN face prior
# ---------------------------------------------------------------------------


def synthetic_gfpgan_sd():
    from video_restore_tpu.models.gfpgan import GFPGANSpec, gfpgan_key_schema

    spec = GFPGANSpec()
    schema = gfpgan_key_schema(spec)
    rng = np.random.default_rng(1234)
    sd = {}
    for k, shape in schema.items():
        if k.endswith("modulation.bias"):
            sd[k] = np.ones(shape, np.float32)
        elif k.endswith(".bias") or "noise_strength" in k:
            sd[k] = rng.normal(0.0, 0.01, shape).astype(np.float32)
        else:
            fan_in = int(np.prod(shape[1:])) or 1
            sd[k] = rng.normal(0.0, (1.0 / fan_in) ** 0.5, shape).astype(
                np.float32
            )
    return sd, spec


def gfpgan_case(models_dir: Path | None, crop: int):
    """Returns (mode, ours, theirs) for the GFPGAN prior."""
    import jax.numpy as jnp

    import torch_gfpgan_ref as tref
    from video_restore_tpu.models.convert import _load_state_dict
    from video_restore_tpu.models.gfpgan import (
        GFPGANSpec,
        apply_gfpgan,
        convert_gfpgan_state_dict,
    )

    spec = GFPGANSpec()
    real = models_dir and (models_dir / f"{GFPGAN_NAME}.pth").exists()
    if real:
        sd = _load_state_dict(models_dir / f"{GFPGAN_NAME}.pth")
        mode = "real"
    else:
        sd, spec = synthetic_gfpgan_sd()
        mode = "synthetic"
    params = convert_gfpgan_state_dict(sd, spec)

    x = golden_tiles(seed=11, n=1, h=crop, w=crop)
    ours = np.asarray(apply_gfpgan(params, jnp.asarray(x), spec))
    import jax

    theirs = tref.gfpgan_forward(
        jax.tree.map(np.asarray, params), x,
        num_latent=spec.num_latent, num_style_feat=spec.num_style_feat,
    )
    return mode, ours, np.asarray(theirs)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def run(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--models-dir", default=None,
                    help="directory holding released .pth files; models "
                         "found there are validated with REAL weights")
    ap.add_argument("--models", nargs="*", default=None,
                    help="subset of model names (default: all + GFPGAN)")
    ap.add_argument("--skip-gfpgan", action="store_true")
    ap.add_argument("--regen-goldens", action="store_true",
                    help="rewrite tests/goldens/*.npz from the torch "
                         "cross-implementation outputs")
    ap.add_argument("--json", default=None, help="write results JSON here")
    args = ap.parse_args(argv)

    # keep everything on host CPU: parity is a numerics check, and the
    # goldens must not depend on accelerator math
    import jax

    jax.config.update("jax_platforms", "cpu")

    from video_restore_tpu.models.zoo import MODEL_ZOO

    names = args.models or list(MODEL_ZOO)
    models_dir = Path(args.models_dir) if args.models_dir else None
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)

    results = []
    fails = 0
    with tempfile.TemporaryDirectory() as td:
        tdir = Path(td)
        for name in names:
            entry = MODEL_ZOO[name]
            real_path = models_dir / entry.pth_name if models_dir else None
            if real_path and real_path.exists():
                pth, mode = real_path, "real"
            else:
                pth, mode = synthetic_sr_checkpoint(name, tdir), "synthetic"
            x = golden_tiles()
            theirs = torch_render_sr(name, pth, x)
            ours = jax_render_sr(name, pth, x)
            psnr, ssim = _scores(ours, theirs)
            ok = psnr >= PSNR_PASS and ssim >= SSIM_PASS
            note = ""
            gfile = GOLDEN_DIR / f"{name}.npz"
            if mode == "synthetic":
                if args.regen_goldens or not gfile.exists():
                    np.savez_compressed(gfile, out=theirs.astype(np.float32))
                    note = "golden written"
                else:
                    stored = np.load(gfile)["out"]
                    gp, _ = _scores(ours, stored)
                    if gp < PSNR_PASS:
                        ok = False
                        note = f"drift vs committed golden ({gp:.1f} dB)"
            results.append(
                {"model": name, "mode": mode, "psnr_db": round(psnr, 2),
                 "ssim": round(ssim, 5), "pass": ok, "note": note}
            )
            fails += 0 if ok else 1

        if not args.skip_gfpgan and (args.models is None
                                     or GFPGAN_NAME in (args.models or [])):
            mode, ours, theirs = gfpgan_case(models_dir, crop=512)
            psnr, ssim = _scores(ours, theirs)
            ok = psnr >= PSNR_PASS and ssim >= SSIM_PASS
            note = ""
            gfile = GOLDEN_DIR / f"{GFPGAN_NAME}.npz"
            if mode == "synthetic":
                if args.regen_goldens or not gfile.exists():
                    np.savez_compressed(gfile, out=theirs.astype(np.float32))
                    note = "golden written"
                else:
                    stored = np.load(gfile)["out"]
                    gp, _ = _scores(ours, stored)
                    if gp < PSNR_PASS:
                        ok = False
                        note = f"drift vs committed golden ({gp:.1f} dB)"
            results.append(
                {"model": GFPGAN_NAME, "mode": mode,
                 "psnr_db": round(psnr, 2), "ssim": round(ssim, 5),
                 "pass": ok, "note": note}
            )
            fails += 0 if ok else 1

    w = max(len(r["model"]) for r in results)
    print(f"{'model':<{w}}  mode       PSNR(dB)   SSIM     result")
    for r in results:
        status = "PASS" if r["pass"] else "FAIL"
        print(
            f"{r['model']:<{w}}  {r['mode']:<9}  {r['psnr_db']:>8.2f} "
            f"{r['ssim']:>8.5f}  {status}  {r['note']}"
        )
    n_real = sum(r["mode"] == "real" for r in results)
    if n_real == 0:
        print(
            "\n(no released .pth files found — all checks ran on "
            "schema-exact synthetic checkpoints. Day-one with network "
            "access: download the released weights into models/ and "
            "re-run `make parity` to certify real-weight parity.)"
        )
    if args.json:
        Path(args.json).write_text(json.dumps(results, indent=1))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(run())
