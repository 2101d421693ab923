"""Independent torch reference implementations of RRDBNet/SRVGGNetCompact.

Written from the published architecture description, with state_dict keys
compatible with the released Real-ESRGAN checkpoints — used to validate (a)
the JAX model math and (b) the .pth -> pytree converter, without needing
network access to the real weights. Torch runs on CPU only.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class ResidualDenseBlock(nn.Module):
    def __init__(self, nf=64, gc=32):
        super().__init__()
        self.conv1 = nn.Conv2d(nf, gc, 3, 1, 1)
        self.conv2 = nn.Conv2d(nf + gc, gc, 3, 1, 1)
        self.conv3 = nn.Conv2d(nf + 2 * gc, gc, 3, 1, 1)
        self.conv4 = nn.Conv2d(nf + 3 * gc, gc, 3, 1, 1)
        self.conv5 = nn.Conv2d(nf + 4 * gc, nf, 3, 1, 1)
        self.lrelu = nn.LeakyReLU(0.2, inplace=True)

    def forward(self, x):
        x1 = self.lrelu(self.conv1(x))
        x2 = self.lrelu(self.conv2(torch.cat((x, x1), 1)))
        x3 = self.lrelu(self.conv3(torch.cat((x, x1, x2), 1)))
        x4 = self.lrelu(self.conv4(torch.cat((x, x1, x2, x3), 1)))
        x5 = self.conv5(torch.cat((x, x1, x2, x3, x4), 1))
        return x5 * 0.2 + x


class RRDB(nn.Module):
    def __init__(self, nf=64, gc=32):
        super().__init__()
        self.rdb1 = ResidualDenseBlock(nf, gc)
        self.rdb2 = ResidualDenseBlock(nf, gc)
        self.rdb3 = ResidualDenseBlock(nf, gc)

    def forward(self, x):
        return self.rdb3(self.rdb2(self.rdb1(x))) * 0.2 + x


class RRDBNetTorch(nn.Module):
    def __init__(self, in_ch=3, out_ch=3, nf=64, nb=23, gc=32, scale=4,
                 unshuffle=True):
        """``unshuffle=True`` is the basicsr (Real-ESRGAN) flavor: scale<4
        pixel-unshuffles the input and keeps two upsample stages. False is
        the original ESRGAN/KAIR flavor (BSRGAN): raw input, log2(scale)
        upsample stages (so x2 has no conv_up2)."""
        super().__init__()
        self.scale = scale
        self.unshuffle = unshuffle
        stem_in = in_ch * (
            (4 if scale == 2 else (16 if scale == 1 else 1))
            if unshuffle else 1
        )
        self.conv_first = nn.Conv2d(stem_in, nf, 3, 1, 1)
        self.body = nn.Sequential(*[RRDB(nf, gc) for _ in range(nb)])
        self.conv_body = nn.Conv2d(nf, nf, 3, 1, 1)
        self.conv_up1 = nn.Conv2d(nf, nf, 3, 1, 1)
        self.two_up = unshuffle or scale == 4
        if self.two_up:
            self.conv_up2 = nn.Conv2d(nf, nf, 3, 1, 1)
        self.conv_hr = nn.Conv2d(nf, nf, 3, 1, 1)
        self.conv_last = nn.Conv2d(nf, out_ch, 3, 1, 1)
        self.lrelu = nn.LeakyReLU(0.2, inplace=True)

    def forward(self, x):
        if self.unshuffle and self.scale == 2:
            x = F.pixel_unshuffle(x, 2)
        elif self.unshuffle and self.scale == 1:
            x = F.pixel_unshuffle(x, 4)
        feat = self.conv_first(x)
        feat = feat + self.conv_body(self.body(feat))
        feat = self.lrelu(
            self.conv_up1(F.interpolate(feat, scale_factor=2, mode="nearest"))
        )
        if self.two_up:
            feat = self.lrelu(
                self.conv_up2(
                    F.interpolate(feat, scale_factor=2, mode="nearest")
                )
            )
        return self.conv_last(self.lrelu(self.conv_hr(feat)))


def to_esrgan_keys(sd):
    """Rename a basicsr-style RRDBNet state_dict to the original
    ESRGAN/KAIR naming used by the BSRGAN releases (RRDB_trunk.*,
    trunk_conv, upconv1/2, HRconv)."""
    out = {}
    for k, v in sd.items():
        k = (
            k.replace("conv_body", "trunk_conv")
            .replace("conv_up1", "upconv1")
            .replace("conv_up2", "upconv2")
            .replace("conv_hr", "HRconv")
        )
        if k.startswith("body."):
            k = "RRDB_trunk." + k[len("body."):]
            k = k.replace(".rdb", ".RDB")
        out[k] = v
    return out


class SRVGGNetCompactTorch(nn.Module):
    def __init__(self, in_ch=3, out_ch=3, nf=64, nc=32, upscale=4):
        super().__init__()
        self.upscale = upscale
        body = [nn.Conv2d(in_ch, nf, 3, 1, 1), nn.PReLU(nf)]
        for _ in range(nc):
            body += [nn.Conv2d(nf, nf, 3, 1, 1), nn.PReLU(nf)]
        body += [nn.Conv2d(nf, out_ch * upscale**2, 3, 1, 1)]
        self.body = nn.Sequential(*body)
        self.upsampler = nn.PixelShuffle(upscale)

    def forward(self, x):
        out = self.upsampler(self.body(x))
        base = F.interpolate(x, scale_factor=self.upscale, mode="nearest")
        return out + base
