"""GFPGAN v1-clean (models/gfpgan.py) vs the independent torch rendering
(torch_gfpgan_ref.py) — the same cross-validation strategy used for
RRDBNet (tests/torch_ref.py): two implementations of the published
architecture, one NHWC/JAX with the input-scaling modulated-conv
identity, one NCHW/torch with classic per-sample grouped weights."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_restore_tpu.models.gfpgan import (
    GFPGANSpec,
    apply_gfpgan,
    init_gfpgan,
    modulated_conv2d,
)


SMALL = GFPGANSpec(out_size=64)


def test_spec_geometry():
    spec = GFPGANSpec()
    assert spec.log_size == 9
    assert spec.num_latent == 16
    # released-checkpoint channel table (channel_multiplier=2)
    assert spec.dec_channels[512] == 64 and spec.dec_channels[64] == 512
    # U-Net runs at half width (unet_narrow = 0.5)
    assert spec.unet_channels[512] == 32 and spec.unet_channels[4] == 256


def test_modulated_conv_identity(rng):
    """Input-scaling formulation == per-sample weight modulation."""
    import torch_gfpgan_ref as tref

    b, h, w, cin, cout = 2, 8, 8, 6, 5
    x = rng.random((b, h, w, cin)).astype(np.float32)
    wgt = rng.random((3, 3, cin, cout)).astype(np.float32) - 0.5
    style = rng.random((b, cin)).astype(np.float32) + 0.5

    ours = np.asarray(
        modulated_conv2d(jnp.asarray(x), jnp.asarray(wgt), jnp.asarray(style))
    )
    import torch

    theirs = tref._modulated_conv(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        {"w": wgt},
        torch.from_numpy(style),
    )
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=2e-5)


def test_gfpgan_parity_small(rng):
    """Full forward parity on a 64px spec (same topology, 4 levels)."""
    import torch_gfpgan_ref as tref

    params = init_gfpgan(jax.random.PRNGKey(0), SMALL)
    x = rng.random((2, 64, 64, 3)).astype(np.float32)
    ours = np.asarray(apply_gfpgan(params, jnp.asarray(x), SMALL))
    host = jax.tree.map(np.asarray, params)
    theirs = tref.gfpgan_forward(
        host, x, num_latent=SMALL.num_latent,
        num_style_feat=SMALL.num_style_feat,
    )
    assert ours.shape == theirs.shape == (2, 64, 64, 3)
    np.testing.assert_allclose(ours, theirs, rtol=5e-4, atol=5e-4)
    assert ours.min() >= 0.0 and ours.max() <= 1.0


def test_gfpgan_full_spec_shapes():
    """512px released-checkpoint geometry compiles via eval_shape."""
    spec = GFPGANSpec()
    params = jax.eval_shape(lambda k: init_gfpgan(k, spec),
                            jax.random.PRNGKey(0))
    out = jax.eval_shape(
        lambda p, x: apply_gfpgan(p, x, spec),
        params,
        jax.ShapeDtypeStruct((1, 512, 512, 3), jnp.float32),
    )
    assert out.shape == (1, 512, 512, 3)
    # decoder final to_rgb consumes latent 15 of 16
    assert params["final_linear"]["w"].shape == (256 * 16, 16 * 512)


def test_gfpgan_converter_schema(rng):
    """Synthetic released-schema state dict converts to the exact init
    pytree structure, and the converted model runs + matches the torch
    rendering fed the same converted weights."""
    import torch_gfpgan_ref as tref

    from video_restore_tpu.models.gfpgan import (
        convert_gfpgan_state_dict,
        gfpgan_key_schema,
    )

    schema = gfpgan_key_schema(SMALL)
    sd = {
        k: (rng.standard_normal(v) * 0.1).astype(np.float32)
        for k, v in schema.items()
    }
    # modulation biases init to 1 in the real files; keep styles sane
    for k in sd:
        if k.endswith("modulation.bias"):
            sd[k] = np.ones(schema[k], np.float32)
    p = convert_gfpgan_state_dict(sd, SMALL)

    ref = init_gfpgan(jax.random.PRNGKey(0), SMALL)
    ref_shapes = jax.tree.map(lambda a: a.shape, ref)
    got_shapes = jax.tree.map(lambda a: a.shape, p)
    assert ref_shapes == got_shapes

    x = rng.random((1, 64, 64, 3)).astype(np.float32)
    ours = np.asarray(apply_gfpgan(p, jnp.asarray(x), SMALL))
    theirs = tref.gfpgan_forward(
        jax.tree.map(np.asarray, p), x,
        num_latent=SMALL.num_latent, num_style_feat=SMALL.num_style_feat,
    )
    np.testing.assert_allclose(ours, theirs, rtol=5e-4, atol=5e-4)


def test_gfpgan_converter_rejects_bad_shape(rng):
    from video_restore_tpu.models.gfpgan import (
        convert_gfpgan_state_dict,
        gfpgan_key_schema,
    )

    schema = gfpgan_key_schema(SMALL)
    sd = {k: np.zeros(v, np.float32) for k, v in schema.items()}
    sd["final_conv.weight"] = np.zeros((1, 2, 3, 4), np.float32)
    with pytest.raises(ValueError, match="final_conv.weight"):
        convert_gfpgan_state_dict(sd, SMALL)
