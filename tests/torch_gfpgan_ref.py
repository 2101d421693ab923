"""Independent torch (NCHW) rendering of the GFPGAN v1-clean architecture,
for numerically validating models/gfpgan.py (same role as torch_ref.py for
RRDBNet). Written from the published architecture description; test-only.

The forward consumes the SAME pytree as models/gfpgan.py (HWIO kernels,
(in, out) linears, NHWC noises) and transposes internally, so a parity
test feeds identical weights to both implementations.
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F

SQRT2 = math.sqrt(2.0)


def _t(a):
    return torch.from_numpy(__import__("numpy").asarray(a)).float()


def _conv(x, p, stride=1, padding=None):
    w = _t(p["w"]).permute(3, 2, 0, 1)  # HWIO -> OIHW
    b = _t(p["b"]) if p.get("b") is not None else None
    if padding is None:
        padding = w.shape[-1] // 2
    return F.conv2d(x, w, b, stride=stride, padding=padding)


def _lrelu(x):
    return F.leaky_relu(x, 0.2)


def _up(x):
    return F.interpolate(x, scale_factor=2, mode="bilinear",
                         align_corners=False)


def _down(x):
    return F.interpolate(x, scale_factor=0.5, mode="bilinear",
                         align_corners=False)


def _res_block(p, x, resample):
    out = _lrelu(_conv(x, p["conv1"]))
    out = resample(out)
    out = _lrelu(_conv(out, p["conv2"]))
    skip = _conv(resample(x), {"w": p["skip"]["w"], "b": None})
    # clean-arch ResBlock: plain sum, no 1/sqrt(2) (that scaling is only
    # in the non-clean gfpganv1 arch)
    return out + skip


def _modulated_conv(x, p, style, demodulate=True, sample_mode=None,
                    eps=1e-8):
    # classic per-sample weight modulation (grouped conv) — deliberately
    # the OTHER formulation from the JAX side's input-scaling identity
    b, cin, _, _ = x.shape
    w = _t(p["w"]).permute(3, 2, 0, 1)  # (out, in, k, k)
    cout, _, k, _ = w.shape
    s = style.view(b, 1, cin, 1, 1)
    weight = w.unsqueeze(0) * s
    if demodulate:
        demod = torch.rsqrt(weight.pow(2).sum([2, 3, 4]) + eps)
        weight = weight * demod.view(b, cout, 1, 1, 1)
    weight = weight.reshape(b * cout, cin, k, k)
    if sample_mode == "upsample":
        x = _up(x)
    elif sample_mode == "downsample":
        x = _down(x)
    h, wd = x.shape[2:]
    x = x.reshape(1, b * cin, h, wd)
    out = F.conv2d(x, weight, padding=k // 2, groups=b)
    return out.view(b, cout, out.shape[2], out.shape[3])


def _linear(x, p):
    y = x @ _t(p["w"])
    if p.get("b") is not None:
        y = y + _t(p["b"])
    return y


def _style_conv(p, x, latent, noise, sample_mode):
    style = _linear(latent, p["modulation"])
    out = _modulated_conv(x, p, style, True, sample_mode) * SQRT2
    if noise is not None:
        out = out + float(p["noise_strength"]) * noise
    out = out + _t(p["b"]).view(1, -1, 1, 1)
    return _lrelu(out)


def _to_rgb(p, x, latent, skip=None):
    style = _linear(latent, p["modulation"])
    out = _modulated_conv(x, p, style, demodulate=False)
    out = out + _t(p["b"]).view(1, -1, 1, 1)
    if skip is not None:
        out = out + _up(skip)
    return out


def _noise_nchw(n):
    return _t(n).permute(0, 3, 1, 2)


@torch.no_grad()
def gfpgan_forward(params, x_nhwc, num_latent=16, num_style_feat=512,
                   sft_half=True):
    """x_nhwc: numpy (B, 512, 512, 3) in [0,1]; returns numpy NHWC."""
    x = _t(x_nhwc).permute(0, 3, 1, 2)
    b = x.shape[0]
    feat = (x - 0.5) * 2.0
    feat = _lrelu(_conv(feat, params["conv_body_first"], padding=0))
    skips = []
    for blk in params["conv_body_down"]:
        feat = _res_block(blk, feat, _down)
        skips.insert(0, feat)
    feat = _lrelu(_conv(feat, params["final_conv"]))
    style_code = _linear(feat.reshape(b, -1), params["final_linear"])
    latents = style_code.view(b, num_latent, num_style_feat)

    conditions = []
    for i, blk in enumerate(params["conv_body_up"]):
        feat = feat + skips[i]
        feat = _res_block(blk, feat, _up)
        sc = params["condition_scale"][i]
        sh = params["condition_shift"][i]
        conditions.append(_conv(_lrelu(_conv(feat, sc[0])), sc[1]))
        conditions.append(_conv(_lrelu(_conv(feat, sh[0])), sh[1]))

    dec = params["decoder"]
    const = _t(dec["constant_input"]).permute(2, 0, 1)[None]
    out = const.expand(b, -1, -1, -1)
    out = _style_conv(dec["style_conv1"], out, latents[:, 0],
                      _noise_nchw(dec["noises"][0]), None)
    skip = _to_rgb(dec["to_rgb1"], out, latents[:, 1])
    i = 1
    for li in range(len(dec["to_rgbs"])):
        out = _style_conv(dec["style_convs"][2 * li], out, latents[:, i],
                          _noise_nchw(dec["noises"][2 * li + 1]), "upsample")
        cs, csh = conditions[2 * li], conditions[2 * li + 1]
        if sft_half:
            half = out.shape[1] // 2
            same, mod = out[:, :half], out[:, half:]
            out = torch.cat([same, mod * cs + csh], dim=1)
        else:
            out = out * cs + csh
        out = _style_conv(dec["style_convs"][2 * li + 1], out,
                          latents[:, i + 1],
                          _noise_nchw(dec["noises"][2 * li + 2]), None)
        skip = _to_rgb(dec["to_rgbs"][li], out, latents[:, i + 2], skip)
        i += 2
    img = torch.clamp(skip, -1.0, 1.0)
    img = (img + 1.0) * 0.5
    return img.permute(0, 2, 3, 1).numpy()
