"""Model architecture + weight-converter parity vs independent torch refs.

These are the golden-tile tests SURVEY.md §4 calls for: a torch model with
random weights is saved as a .pth-style state_dict, converted to a JAX
pytree, and both models must produce the same output.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_restore_tpu.models.convert import convert_rrdbnet, convert_srvgg
from video_restore_tpu.models.rrdbnet import RRDBNetSpec, apply_rrdbnet, init_rrdbnet
from video_restore_tpu.models.srvgg import SRVGGSpec, apply_srvgg, init_srvgg
from video_restore_tpu.models.zoo import (
    MODEL_ZOO,
    load_params_npz,
    random_model,
    save_params_npz,
)

torch = pytest.importorskip("torch")
from torch_ref import RRDBNetTorch, SRVGGNetCompactTorch  # noqa: E402


def _sd_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.mark.parametrize("scale", [4, 2])
def test_rrdbnet_matches_torch(rng, scale):
    torch.manual_seed(0)
    tm = RRDBNetTorch(nf=16, nb=2, gc=8, scale=scale).eval()
    params = convert_rrdbnet(_sd_numpy(tm), num_block=2)
    spec = RRDBNetSpec(num_feat=16, num_block=2, num_grow_ch=8, scale=scale)

    x = rng.random((1, 8, 12, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    ours = np.asarray(apply_rrdbnet(params, jnp.asarray(x), spec))
    assert ours.shape == ref.shape == (1, 8 * scale, 12 * scale, 3)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)


@pytest.mark.parametrize("scale", [4, 2])
def test_bsrgan_matches_torch(rng, scale):
    """BSRGAN (ESRGAN/KAIR flavor, reference README.md:3): RRDB_trunk key
    naming; the x2 variant feeds the raw input (no pixel-unshuffle) and
    has a single upsample stage."""
    from torch_ref import to_esrgan_keys

    torch.manual_seed(2)
    unshuffle = False
    tm = RRDBNetTorch(nf=16, nb=2, gc=8, scale=scale,
                      unshuffle=unshuffle).eval()
    sd = to_esrgan_keys(_sd_numpy(tm))
    params = convert_rrdbnet(sd, num_block=2, key_style="esrgan",
                             num_upsample=2 if scale == 4 else 1)
    spec = RRDBNetSpec(num_feat=16, num_block=2, num_grow_ch=8, scale=scale,
                       unshuffle=unshuffle, key_style="esrgan")
    assert ("conv_up2" in params) == (scale == 4)

    x = rng.random((1, 8, 12, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    ours = np.asarray(apply_rrdbnet(params, jnp.asarray(x), spec))
    assert ours.shape == ref.shape == (1, 8 * scale, 12 * scale, 3)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)


def test_srvgg_matches_torch(rng):
    torch.manual_seed(1)
    tm = SRVGGNetCompactTorch(nf=16, nc=3, upscale=4).eval()
    params = convert_srvgg(_sd_numpy(tm), num_conv=3)
    spec = SRVGGSpec(num_feat=16, num_conv=3, scale=4)

    x = rng.random((2, 6, 10, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    ours = np.asarray(apply_srvgg(params, jnp.asarray(x), spec))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)


def test_zoo_shapes():
    """Every zoo entry produces the right output shape with random params."""
    x = jnp.ones((1, 8, 8, 3), jnp.float32)
    for name, entry in MODEL_ZOO.items():
        # shrink to keep CPU test time sane
        m = random_model(name)
        y = m.apply(x)
        s = entry.spec.scale
        assert y.shape == (1, 8 * s, 8 * s, 3), name
        assert np.isfinite(np.asarray(y)).all(), name


def test_npz_roundtrip(tmp_path):
    m = random_model("RealESRGAN_x4plus_anime_6B", seed=3)
    p = tmp_path / "m.npz"
    save_params_npz(m.params, p)
    loaded = load_params_npz("RealESRGAN_x4plus_anime_6B", p)
    for a, b in zip(jax.tree.leaves(m.params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pth_end_to_end_conversion(tmp_path, rng, monkeypatch):
    """Full path: torch.save -> convert_pth_to_params -> apply."""
    from video_restore_tpu.models import zoo
    from video_restore_tpu.models.convert import convert_pth_to_params

    torch.manual_seed(2)
    tm = SRVGGNetCompactTorch(nf=8, nc=2, upscale=4).eval()
    pth = tmp_path / "tiny.pth"
    torch.save({"params": tm.state_dict()}, pth)

    spec = SRVGGSpec(num_feat=8, num_conv=2, scale=4)
    monkeypatch.setitem(
        zoo.MODEL_ZOO, "tiny_srvgg", zoo.ZooEntry(spec, "http://x", "tiny.pth")
    )
    params = convert_pth_to_params(pth, "tiny_srvgg")
    x = rng.random((1, 5, 7, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    ours = np.asarray(apply_srvgg(params, jnp.asarray(x), spec))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)


def test_bf16_psnr_acceptable(rng):
    """bf16 inference must stay close to fp32 (PSNR parity bar)."""
    spec = SRVGGSpec(num_feat=16, num_conv=3, scale=2)
    params = init_srvgg(jax.random.PRNGKey(0), spec)
    x = rng.random((1, 16, 16, 3)).astype(np.float32)
    y32 = np.asarray(apply_srvgg(params, jnp.asarray(x), spec))
    pbf = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    ybf = np.asarray(
        apply_srvgg(pbf, jnp.asarray(x, jnp.bfloat16), spec)
    ).astype(np.float32)
    mse = float(np.mean((y32 - ybf) ** 2))
    psnr = 10 * np.log10(max(y32.max(), 1.0) ** 2 / max(mse, 1e-12))
    assert psnr > 35, f"bf16 deviates too much from fp32: psnr={psnr:.1f}"
