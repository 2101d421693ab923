"""GFPGAN v1-clean face restoration (U-Net prior + StyleGAN2-clean CSFT
decoder) as a pure-functional JAX model.

The reference advertises GFPGAN face enhancement but never implements it
(/root/reference/README.md:3, requirements.txt:11; SURVEY.md §2.5). This
is an independent re-implementation of the "clean" GFPGAN architecture
(the variant shipped as GFPGANv1.3/v1.4 checkpoints: no custom CUDA ops —
bilinear resampling instead of upfirdn2d, plain LeakyReLU instead of the
fused bias+act kernel):

- **Encoder/U-Net**: 1x1 stem at 512px, 7 residual down blocks to 4x4,
  a final 3x3 + linear producing one w-latent per decoder layer
  (different_w), then 7 residual up blocks; each up level emits an SFT
  (scale, shift) condition pair through a small conv head.
- **Decoder**: StyleGAN2-clean generator with CSFT — constant 4x4 input,
  per-layer modulated 3x3 convs (style modulation + demodulation),
  bilinear 2x upsampling, noise injection from stored buffers, skip
  to-RGB accumulation; the U-Net conditions modulate HALF the feature
  channels at each resolution (sft_half).

TPU-first notes:

- NHWC activations; the per-sample modulated conv is expressed as
  input-channel scaling -> shared-weight conv -> output demodulation
  (algebraically identical to per-sample weight modulation, and it keeps
  one large MXU conv instead of per-sample grouped kernels).
- Faces are processed as a batch of 512x512 crops; everything jits to a
  single program.

Checkpoint schema: the converter consumes the released `params_ema` dict
(keys pinned in :data:`GFPGAN_KEY_SCHEMA` — torch OIHW kernels transposed
to HWIO). Zero-egress caveat: validated against an independent torch
rendering of the same published architecture (tests/torch_gfpgan_ref.py),
not against a downloaded checkpoint; structural assumptions that parity
cannot pin in this environment (sqrt(2) placements, bilinear
align_corners=False, unet_narrow=0.5) are marked inline.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from video_restore_tpu.ops.conv import conv2d, leaky_relu

Params = Dict[str, Any]

_SQRT2 = 2.0**0.5


@dataclasses.dataclass(frozen=True)
class GFPGANSpec:
    out_size: int = 512
    num_style_feat: int = 512
    channel_multiplier: int = 2
    # GFPGANv1Clean passes narrow=1 to the decoder and narrow*0.5 to the
    # U-Net channel table
    narrow: float = 1.0
    sft_half: bool = True

    @property
    def log_size(self) -> int:
        return int(math.log2(self.out_size))

    @property
    def num_latent(self) -> int:
        return self.log_size * 2 - 2

    def channels(self, narrow: float) -> Dict[int, int]:
        cm = self.channel_multiplier
        base = {
            4: 512, 8: 512, 16: 512, 32: 512,
            64: 256 * cm, 128: 128 * cm, 256: 64 * cm, 512: 32 * cm,
            1024: 16 * cm,
        }
        return {k: int(v * narrow) for k, v in base.items()}

    @property
    def unet_channels(self) -> Dict[int, int]:
        return self.channels(self.narrow * 0.5)

    @property
    def dec_channels(self) -> Dict[int, int]:
        return self.channels(self.narrow)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _resize2x(x: jax.Array) -> jax.Array:
    """Bilinear 2x upsample, torch align_corners=False semantics."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * 2, w * 2, c), "bilinear")


def _resize_half(x: jax.Array) -> jax.Array:
    """0.5x bilinear downsample, torch align_corners=False semantics.

    At exactly 0.5x with half-pixel centres, torch's non-antialiased
    bilinear sample reduces to a 2x2 average (src = 2*dst + 0.5).
    jax.image.resize would antialias on downsampling (wider kernel), so
    the pooling form is both exact-to-torch and cheaper."""
    n, h, w, c = x.shape
    return x.reshape(n, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def modulated_conv2d(
    x: jax.Array,
    w: jax.Array,
    style: jax.Array,
    demodulate: bool = True,
    sample_mode: str | None = None,
    eps: float = 1e-8,
) -> jax.Array:
    """StyleGAN2 modulated conv, NHWC x HWIO, per-sample style.

    Per-sample weight modulation W*s followed by demodulation is linear in
    the input, so it is computed as (x * s) -> shared conv -> (* demod):
    one full-batch MXU conv instead of per-sample grouped kernels.

    x: (B, H, W, cin); w: (k, k, cin, cout); style: (B, cin).
    """
    if sample_mode == "upsample":
        x = _resize2x(x)
    elif sample_mode == "downsample":
        x = _resize_half(x)
    xs = x * style[:, None, None, :].astype(x.dtype)
    y = conv2d(xs, w)
    if demodulate:
        # demod_o = rsqrt(sum_{k,k,cin} (w * s)^2 + eps), per sample
        w2 = jnp.sum(w.astype(jnp.float32) ** 2, axis=(0, 1))  # (cin, cout)
        denom = style.astype(jnp.float32) ** 2 @ w2  # (B, cout)
        y = y * jax.lax.rsqrt(denom + eps)[:, None, None, :].astype(y.dtype)
    return y


def _linear(x: jax.Array, p: Params) -> jax.Array:
    """Plain nn.Linear: p['w'] stored (in, out)."""
    y = x @ p["w"].astype(x.dtype)
    if p.get("b") is not None:
        y = y + p["b"].astype(x.dtype)
    return y


def _style_conv(
    p: Params,
    x: jax.Array,
    latent: jax.Array,
    noise: jax.Array | None,
    sample_mode: str | None,
) -> jax.Array:
    """StyleConv (clean): modulated conv * sqrt(2), + strength*noise,
    + bias, LeakyReLU(0.2). (The sqrt(2) mirrors the clean-arch
    conversion of the original fused bias-act scaling — pinned
    assumption, see module docstring.)"""
    style = _linear(latent, p["modulation"])
    out = modulated_conv2d(
        x, p["w"], style, demodulate=True, sample_mode=sample_mode
    )
    out = out * jnp.asarray(_SQRT2, out.dtype)
    if noise is not None:
        out = out + p["noise_strength"].astype(out.dtype) * noise
    out = out + p["b"].astype(out.dtype)
    return leaky_relu(out, 0.2)


def _to_rgb(p: Params, x: jax.Array, latent: jax.Array, skip=None):
    """ToRGB (clean): 1x1 modulated conv without demodulation + bias;
    accumulates the bilinearly upsampled skip."""
    style = _linear(latent, p["modulation"])
    out = modulated_conv2d(x, p["w"], style, demodulate=False)
    out = out + p["b"].astype(out.dtype)
    if skip is not None:
        out = out + _resize2x(skip)
    return out


def _res_block(p: Params, x: jax.Array, resample) -> jax.Array:
    """Clean ResBlock: conv1 -> lrelu -> resample -> conv2 -> lrelu, plus
    a resampled 1x1 skip. The clean arch returns plain ``out + skip``;
    the 1/sqrt(2) scaling exists only in the non-clean gfpganv1 arch and
    must NOT be applied here (it would attenuate features ~2^-7 across
    the 7+7 blocks against real v1.3/v1.4 params_ema checkpoints)."""
    out = leaky_relu(conv2d(x, p["conv1"]["w"], p["conv1"]["b"]), 0.2)
    out = resample(out)
    out = leaky_relu(conv2d(out, p["conv2"]["w"], p["conv2"]["b"]), 0.2)
    skip = conv2d(resample(x), p["skip"]["w"])
    return out + skip


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def apply_gfpgan(
    params: Params, x: jax.Array, spec: GFPGANSpec = GFPGANSpec()
) -> jax.Array:
    """Restore a batch of aligned face crops.

    x: (B, 512, 512, 3) RGB in [0, 1]. Returns same shape in [0, 1].
    """
    ls = spec.log_size
    nsf = spec.num_style_feat
    dt = x.dtype
    b = x.shape[0]
    # GFPGAN normalizes crops to [-1, 1]
    feat = (x - 0.5) * 2.0

    feat = leaky_relu(
        conv2d(feat, params["conv_body_first"]["w"],
               params["conv_body_first"]["b"]),
        0.2,
    )
    unet_skips: List[jax.Array] = []
    for blk in params["conv_body_down"]:
        feat = _res_block(blk, feat, _resize_half)
        unet_skips.insert(0, feat)
    feat = leaky_relu(
        conv2d(feat, params["final_conv"]["w"], params["final_conv"]["b"]),
        0.2,
    )

    # NHWC -> torch's flatten order (C, H, W) so converted final_linear
    # weights line up
    flat = feat.transpose(0, 3, 1, 2).reshape(b, -1)
    style_code = _linear(flat, params["final_linear"])
    latents = style_code.reshape(b, spec.num_latent, nsf)

    conditions: List[jax.Array] = []
    for i, blk in enumerate(params["conv_body_up"]):
        feat = feat + unet_skips[i]
        feat = _res_block(blk, feat, _resize2x)
        sc = params["condition_scale"][i]
        sh = params["condition_shift"][i]
        scale = conv2d(
            leaky_relu(conv2d(feat, sc[0]["w"], sc[0]["b"]), 0.2),
            sc[1]["w"], sc[1]["b"],
        )
        shift = conv2d(
            leaky_relu(conv2d(feat, sh[0]["w"], sh[0]["b"]), 0.2),
            sh[1]["w"], sh[1]["b"],
        )
        conditions.extend([scale, shift])

    # --- StyleGAN2-clean CSFT decoder ---
    dec = params["decoder"]
    const = dec["constant_input"].astype(dt)  # (4, 4, c4)
    out = jnp.broadcast_to(const[None], (b,) + const.shape)
    out = _style_conv(
        dec["style_conv1"], out, latents[:, 0], dec["noises"][0].astype(dt),
        None,
    )
    skip = _to_rgb(dec["to_rgb1"], out, latents[:, 1])

    i = 1
    for li in range(ls - 2):
        conv1 = dec["style_convs"][2 * li]
        conv2 = dec["style_convs"][2 * li + 1]
        n1 = dec["noises"][2 * li + 1].astype(dt)
        n2 = dec["noises"][2 * li + 2].astype(dt)
        out = _style_conv(conv1, out, latents[:, i], n1, "upsample")
        # CSFT: the U-Net condition modulates half the channels
        cs, csh = conditions[2 * li], conditions[2 * li + 1]
        if spec.sft_half:
            half = out.shape[-1] // 2
            mod = out[..., half:] * cs.astype(dt) + csh.astype(dt)
            out = jnp.concatenate([out[..., :half], mod], axis=-1)
        else:
            out = out * cs.astype(dt) + csh.astype(dt)
        out = _style_conv(conv2, out, latents[:, i + 1], n2, None)
        skip = _to_rgb(dec["to_rgbs"][li], out, latents[:, i + 2], skip)
        i += 2

    img = jnp.clip(skip, -1.0, 1.0)
    return ((img + 1.0) * 0.5).astype(x.dtype)


# ---------------------------------------------------------------------------
# released-checkpoint conversion
# ---------------------------------------------------------------------------

GFPGAN_URLS = {
    # TencentARC/GFPGAN releases; the reference lists gfpgan in
    # requirements.txt:11 but never wires it
    "GFPGANv1.4": "https://github.com/TencentARC/GFPGAN/releases/download/v1.3.4/GFPGANv1.4.pth",
    "GFPGANv1.3": "https://github.com/TencentARC/GFPGAN/releases/download/v1.3.0/GFPGANv1.3.pth",
}


def gfpgan_key_schema(spec: GFPGANSpec = GFPGANSpec()) -> Dict[str, tuple]:
    """Expected `params_ema` keys -> torch shapes for the released
    v1-clean checkpoints (inference subset; the style MLP and toRGB
    supervision heads exist in the file but are unused with
    input_is_latent/different_w). Pins the serialization schema the same
    way models/convert.py does for Real-ESRGAN."""
    uch, dch, ls, nsf = (
        spec.unet_channels, spec.dec_channels, spec.log_size,
        spec.num_style_feat,
    )
    ks: Dict[str, tuple] = {}

    def conv(prefix, k, cin, cout, bias=True):
        ks[f"{prefix}.weight"] = (cout, cin, k, k)
        if bias:
            ks[f"{prefix}.bias"] = (cout,)

    conv("conv_body_first", 1, 3, uch[2**ls])
    cin = uch[2**ls]
    for j, i in enumerate(range(ls, 2, -1)):
        cout = uch[2 ** (i - 1)]
        conv(f"conv_body_down.{j}.conv1", 3, cin, cin)
        conv(f"conv_body_down.{j}.conv2", 3, cin, cout)
        conv(f"conv_body_down.{j}.skip", 1, cin, cout, bias=False)
        cin = cout
    conv("final_conv", 3, uch[4], uch[4])
    ks["final_linear.weight"] = (spec.num_latent * nsf, uch[4] * 16)
    ks["final_linear.bias"] = (spec.num_latent * nsf,)
    cin = uch[4]
    for j, i in enumerate(range(3, ls + 1)):
        cout = uch[2**i]
        conv(f"conv_body_up.{j}.conv1", 3, cin, cin)
        conv(f"conv_body_up.{j}.conv2", 3, cin, cout)
        conv(f"conv_body_up.{j}.skip", 1, cin, cout, bias=False)
        sft_out = dch[2**i] // 2 if spec.sft_half else dch[2**i]
        conv(f"condition_scale.{j}.0", 3, cout, cout)
        conv(f"condition_scale.{j}.2", 3, cout, sft_out)
        conv(f"condition_shift.{j}.0", 3, cout, cout)
        conv(f"condition_shift.{j}.2", 3, cout, sft_out)
        cin = cout

    def mconv(prefix, k, cin, cout):
        ks[f"{prefix}.modulated_conv.weight"] = (1, cout, cin, k, k)
        ks[f"{prefix}.modulated_conv.modulation.weight"] = (cin, nsf)
        ks[f"{prefix}.modulated_conv.modulation.bias"] = (cin,)
        ks[f"{prefix}.bias"] = (1, cout, 1, 1)

    d = "stylegan_decoder"
    ks[f"{d}.constant_input.weight"] = (1, dch[4], 4, 4)
    mconv(f"{d}.style_conv1", 3, dch[4], dch[4])
    ks[f"{d}.style_conv1.weight"] = (1,)  # noise strength
    mconv(f"{d}.to_rgb1", 1, dch[4], 3)
    ks[f"{d}.noises.noise0"] = (1, 1, 4, 4)
    cin = dch[4]
    n = 0
    for i in range(3, ls + 1):
        cout = dch[2**i]
        mconv(f"{d}.style_convs.{2 * n}", 3, cin, cout)
        ks[f"{d}.style_convs.{2 * n}.weight"] = (1,)
        mconv(f"{d}.style_convs.{2 * n + 1}", 3, cout, cout)
        ks[f"{d}.style_convs.{2 * n + 1}.weight"] = (1,)
        mconv(f"{d}.to_rgbs.{n}", 1, cout, 3)
        res = 2**i
        ks[f"{d}.noises.noise{2 * n + 1}"] = (1, 1, res, res)
        ks[f"{d}.noises.noise{2 * n + 2}"] = (1, 1, res, res)
        cin = cout
        n += 1
    return ks


def convert_gfpgan_state_dict(
    sd: Dict[str, Any], spec: GFPGANSpec = GFPGANSpec()
) -> Params:
    """Released `params_ema` dict -> the pytree apply_gfpgan consumes.

    Validates every consumed tensor's shape against
    :func:`gfpgan_key_schema` (a silent mismatch would mean the pinned
    schema diverged from the real file — fail loudly instead)."""
    import numpy as np

    schema = gfpgan_key_schema(spec)

    def get(key):
        if key not in sd:
            raise KeyError(f"GFPGAN checkpoint missing key {key!r}")
        a = np.asarray(sd[key], dtype=np.float32)
        if tuple(a.shape) != schema[key]:
            raise ValueError(
                f"GFPGAN key {key!r}: shape {tuple(a.shape)} != pinned "
                f"{schema[key]}"
            )
        return a

    def conv(prefix, bias=True):
        w = get(f"{prefix}.weight").transpose(2, 3, 1, 0)  # OIHW -> HWIO
        out = {"w": jnp.asarray(w)}
        out["b"] = jnp.asarray(get(f"{prefix}.bias")) if bias else None
        return out

    def mconv(prefix):
        w = get(f"{prefix}.modulated_conv.weight")[0]  # (out,in,k,k)
        return {
            "w": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "modulation": {
                "w": jnp.asarray(
                    get(f"{prefix}.modulated_conv.modulation.weight").T
                ),
                "b": jnp.asarray(
                    get(f"{prefix}.modulated_conv.modulation.bias")
                ),
            },
            "b": jnp.asarray(get(f"{prefix}.bias").reshape(-1)),
        }

    ls = spec.log_size
    p: Params = {"conv_body_first": conv("conv_body_first")}
    p["conv_body_down"] = [
        {
            "conv1": conv(f"conv_body_down.{j}.conv1"),
            "conv2": conv(f"conv_body_down.{j}.conv2"),
            "skip": conv(f"conv_body_down.{j}.skip", bias=False),
        }
        for j in range(ls - 2)
    ]
    p["final_conv"] = conv("final_conv")
    p["final_linear"] = {
        "w": jnp.asarray(get("final_linear.weight").T),
        "b": jnp.asarray(get("final_linear.bias")),
    }
    p["conv_body_up"] = [
        {
            "conv1": conv(f"conv_body_up.{j}.conv1"),
            "conv2": conv(f"conv_body_up.{j}.conv2"),
            "skip": conv(f"conv_body_up.{j}.skip", bias=False),
        }
        for j in range(ls - 2)
    ]
    p["condition_scale"] = [
        [conv(f"condition_scale.{j}.0"), conv(f"condition_scale.{j}.2")]
        for j in range(ls - 2)
    ]
    p["condition_shift"] = [
        [conv(f"condition_shift.{j}.0"), conv(f"condition_shift.{j}.2")]
        for j in range(ls - 2)
    ]

    d = "stylegan_decoder"
    dec: Params = {
        "constant_input": jnp.asarray(
            get(f"{d}.constant_input.weight")[0].transpose(1, 2, 0)
        ),
        "style_conv1": {
            **mconv(f"{d}.style_conv1"),
            "noise_strength": jnp.asarray(
                get(f"{d}.style_conv1.weight").reshape(())
            ),
        },
        "to_rgb1": mconv(f"{d}.to_rgb1"),
    }
    convs, rgbs, noises = [], [], []
    noises.append(
        jnp.asarray(get(f"{d}.noises.noise0")[0].transpose(1, 2, 0)[None])
    )
    for n in range(ls - 2):
        for m in (2 * n, 2 * n + 1):
            convs.append({
                **mconv(f"{d}.style_convs.{m}"),
                "noise_strength": jnp.asarray(
                    get(f"{d}.style_convs.{m}.weight").reshape(())
                ),
            })
        rgbs.append(mconv(f"{d}.to_rgbs.{n}"))
        for m in (2 * n + 1, 2 * n + 2):
            noises.append(
                jnp.asarray(
                    get(f"{d}.noises.noise{m}")[0].transpose(1, 2, 0)[None]
                )
            )
    dec["style_convs"] = convs
    dec["to_rgbs"] = rgbs
    dec["noises"] = noises
    p["decoder"] = dec
    return p


def load_gfpgan(
    models_dir=None,
    name: str = "GFPGANv1.4",
    spec: GFPGANSpec = GFPGANSpec(),
):
    """Load (download + convert) a released GFPGAN checkpoint; falls back
    to random weights under VRT_ALLOW_RANDOM_WEIGHTS=1 (tests / smoke).
    Returns (params, spec) or raises RuntimeError."""
    import os
    from pathlib import Path

    from video_restore_tpu.models.convert import _load_state_dict
    from video_restore_tpu.models.zoo import _download

    mdir = Path(models_dir) if models_dir else Path("models")
    path = mdir / f"{name}.pth"
    if not path.exists():
        try:
            _download(GFPGAN_URLS[name], path)
        except Exception as e:
            # deliberately NOT the generic VRT_ALLOW_RANDOM_WEIGHTS: a
            # random face prior produces garbage faces, so the pipeline
            # should fall back to the region heuristic unless a smoke run
            # asks for it explicitly
            if os.environ.get("VRT_GFPGAN_RANDOM") == "1":
                return init_gfpgan(jax.random.PRNGKey(0), spec), spec
            raise RuntimeError(
                f"cannot download {name} ({e}); place the file at {path} "
                "or set VRT_GFPGAN_RANDOM=1 for a smoke run"
            ) from e
    sd = _load_state_dict(path)
    if "params_ema" in sd:
        sd = sd["params_ema"]
    return convert_gfpgan_state_dict(sd, spec), spec


# ---------------------------------------------------------------------------
# init (tests / random-weight fallback)
# ---------------------------------------------------------------------------


def _conv_p(key, k, cin, cout, bias=True, dtype=jnp.float32):
    std = (2.0 / (k * k * cin)) ** 0.5
    w = jax.random.normal(key, (k, k, cin, cout), dtype) * std
    return {"w": w, "b": jnp.zeros((cout,), dtype) if bias else None}


def init_gfpgan(
    key: jax.Array, spec: GFPGANSpec = GFPGANSpec(), dtype=jnp.float32
) -> Params:
    """Random init with the exact released-checkpoint geometry."""
    uch = spec.unet_channels
    dch = spec.dec_channels
    ls = spec.log_size
    nsf = spec.num_style_feat
    keys = iter(jax.random.split(key, 256))

    p: Params = {}
    p["conv_body_first"] = _conv_p(next(keys), 1, 3, uch[2**ls], dtype=dtype)
    down = []
    cin = uch[2**ls]
    for i in range(ls, 2, -1):
        cout = uch[2 ** (i - 1)]
        down.append({
            "conv1": _conv_p(next(keys), 3, cin, cin, dtype=dtype),
            "conv2": _conv_p(next(keys), 3, cin, cout, dtype=dtype),
            "skip": _conv_p(next(keys), 1, cin, cout, bias=False, dtype=dtype),
        })
        cin = cout
    p["conv_body_down"] = down
    p["final_conv"] = _conv_p(next(keys), 3, uch[4], uch[4], dtype=dtype)
    lin_out = spec.num_latent * nsf
    p["final_linear"] = {
        "w": jax.random.normal(next(keys), (uch[4] * 16, lin_out), dtype)
        * (1.0 / (uch[4] * 16) ** 0.5),
        "b": jnp.zeros((lin_out,), dtype),
    }

    up, cscale, cshift = [], [], []
    cin = uch[4]
    for i in range(3, ls + 1):
        cout = uch[2**i]
        up.append({
            "conv1": _conv_p(next(keys), 3, cin, cin, dtype=dtype),
            "conv2": _conv_p(next(keys), 3, cin, cout, dtype=dtype),
            "skip": _conv_p(next(keys), 1, cin, cout, bias=False, dtype=dtype),
        })
        sft_out = dch[2**i] // 2 if spec.sft_half else dch[2**i]
        cscale.append([
            _conv_p(next(keys), 3, cout, cout, dtype=dtype),
            _conv_p(next(keys), 3, cout, sft_out, dtype=dtype),
        ])
        cshift.append([
            _conv_p(next(keys), 3, cout, cout, dtype=dtype),
            _conv_p(next(keys), 3, cout, sft_out, dtype=dtype),
        ])
        cin = cout
    p["conv_body_up"] = up
    p["condition_scale"] = cscale
    p["condition_shift"] = cshift

    def style_conv(key, cin, cout):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "w": jax.random.normal(k1, (3, 3, cin, cout), dtype)
            * (1.0 / (cin * 9) ** 0.5),
            "modulation": {
                "w": jax.random.normal(k2, (nsf, cin), dtype)
                * (1.0 / nsf**0.5),
                "b": jnp.ones((cin,), dtype),
            },
            "noise_strength": jnp.zeros((), dtype),
            "b": jnp.zeros((cout,), dtype),
        }

    def to_rgb(key, cin):
        k1, k2 = jax.random.split(key)
        return {
            "w": jax.random.normal(k1, (1, 1, cin, 3), dtype)
            * (1.0 / cin**0.5),
            "modulation": {
                "w": jax.random.normal(k2, (nsf, cin), dtype)
                * (1.0 / nsf**0.5),
                "b": jnp.ones((cin,), dtype),
            },
            "b": jnp.zeros((3,), dtype),
        }

    dec: Params = {}
    # (the checkpoint's style MLP is unused at inference: GFPGAN feeds
    # w-latents directly, input_is_latent + different_w)
    dec["constant_input"] = jax.random.normal(
        next(keys), (4, 4, dch[4]), dtype
    )
    dec["style_conv1"] = style_conv(next(keys), dch[4], dch[4])
    dec["to_rgb1"] = to_rgb(next(keys), dch[4])
    convs, rgbs, noises = [], [], []
    noises.append(jax.random.normal(next(keys), (1, 4, 4, 1), dtype))
    cin = dch[4]
    for i in range(3, ls + 1):
        cout = dch[2**i]
        convs.append(style_conv(next(keys), cin, cout))
        convs.append(style_conv(next(keys), cout, cout))
        rgbs.append(to_rgb(next(keys), cout))
        res = 2**i
        noises.append(jax.random.normal(next(keys), (1, res, res, 1), dtype))
        noises.append(jax.random.normal(next(keys), (1, res, res, 1), dtype))
        cin = cout
    dec["style_convs"] = convs
    dec["to_rgbs"] = rgbs
    dec["noises"] = noises
    p["decoder"] = dec
    return p
