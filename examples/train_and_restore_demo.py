#!/usr/bin/env python
"""End-to-end learning demo: fine-tune, restore, measure.

1. Renders a synthetic clean clip and a degraded copy (blur + noise + 2x
   downscale).
2. Trains a compact SRVGG 2x model on clean patches (degrade-on-the-fly).
3. Restores the degraded clip with the untrained and the trained model.
4. Reports PSNR against the clean source — the trained model must beat
   both the untrained model and plain nearest upscaling.

Runs on CPU in a couple of minutes; no weights, no ffmpeg, no network.

    python examples/train_and_restore_demo.py [--steps 300]
"""

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the default (TPU) backend instead of CPU")
    args = ap.parse_args()
    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from video_restore_tpu.config import RestoreConfig
    from video_restore_tpu.metrics import frame_psnr
    from video_restore_tpu.models.srvgg import SRVGGSpec, init_srvgg
    from video_restore_tpu.models.zoo import ModelHandle
    from video_restore_tpu.pipeline.runner import VideoRestorer
    from video_restore_tpu.training.train import Trainer
    from video_restore_tpu.video import open_reader, open_writer
    from video_restore_tpu.video.fixtures import synth_source_clip

    work = Path(tempfile.mkdtemp(prefix="vrt_demo_"))
    h, w, scale = 288, 512, 2

    print("1/4 rendering clean + degraded clips...")
    clean = synth_source_clip(args.frames, h, w, seed=11)
    import cv2

    rng = np.random.default_rng(0)

    def degrade(f):
        g = cv2.GaussianBlur(f, (0, 0), 1.2)
        g = cv2.resize(g, (w // scale, h // scale),
                       interpolation=cv2.INTER_AREA).astype(np.float32)
        g += rng.normal(0, 6, g.shape)
        return np.clip(g, 0, 255).astype(np.uint8)

    degraded = [degrade(f) for f in clean]
    deg_path = work / "degraded.npz"
    with open_writer(deg_path, w // scale, h // scale, 24) as wr:
        for f in degraded:
            wr.write(f)

    spec = SRVGGSpec(num_feat=16, num_conv=4, scale=scale)
    cfg = RestoreConfig(
        model_name="RealESRGAN_x4_v3", tile_size=128, tile_overlap=8,
        precision="fp32", audio_copy=False,
    )

    def restore_with(params, tag):
        model = ModelHandle(tag, spec, params)
        out_path = work / f"restored_{tag}.npz"
        r = VideoRestorer(cfg, model=model)
        assert r.process_video(deg_path, out_path, show_progress=False)
        with open_reader(out_path) as rd:
            outs = list(rd)
        return float(np.mean([
            frame_psnr(a, b) for a, b in zip(outs, clean)
        ]))

    print("2/4 baseline restorations...")
    p0 = init_srvgg(jax.random.PRNGKey(0), spec)
    psnr_untrained = restore_with(p0, "untrained")
    nearest = [np.repeat(np.repeat(f, scale, 0), scale, 1) for f in degraded]
    psnr_nearest = float(np.mean([
        frame_psnr(a, b) for a, b in zip(nearest, clean)
    ]))

    print(f"3/4 training {args.steps} steps...")
    from video_restore_tpu.models.srvgg import apply_srvgg

    trainer = Trainer(
        # stripe=False: training must stay on the differentiable XLA
        # path (the Pallas kernel defines no VJP)
        lambda p, x: apply_srvgg(p, x, spec, stripe=False), p0, scale,
        learning_rate=2e-3,
    )
    # train on clean patches (degrade-on-the-fly mirrors the degradation)
    hr_patches = []
    prng = np.random.default_rng(1)
    for f in clean:
        for _ in range(6):
            y0 = prng.integers(0, h - 64)
            x0 = prng.integers(0, w - 64)
            hr_patches.append(f[y0:y0 + 64, x0:x0 + 64].astype(np.float32) / 255.0)
    params = trainer.fit_patches(np.stack(hr_patches), args.steps)
    print(f"    loss {trainer.losses[0]:.4f} -> {trainer.losses[-1]:.4f}")

    print("4/4 restoring with the trained model...")
    psnr_trained = restore_with(params, "trained")

    print()
    print(f"  PSNR vs clean source ({args.frames} frames, {w}x{h}):")
    print(f"    nearest upscale   : {psnr_nearest:6.2f} dB")
    print(f"    untrained model   : {psnr_untrained:6.2f} dB")
    print(f"    fine-tuned model  : {psnr_trained:6.2f} dB")
    ok = psnr_trained > psnr_untrained and psnr_trained > psnr_nearest
    print(f"  => {'LEARNED' if ok else 'DID NOT IMPROVE'}")
    print(f"  artifacts: {work}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
