"""The source-major (regrouped) RDB path must be numerically equivalent to
the torch-ordered naive path for every architecture variant."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_restore_tpu.models.rrdbnet import (
    RRDBNetSpec,
    apply_rrdbnet,
    init_rrdbnet,
)


@pytest.mark.parametrize(
    "spec",
    [
        RRDBNetSpec(num_feat=16, num_block=2, num_grow_ch=8, scale=4),
        RRDBNetSpec(num_feat=16, num_block=1, num_grow_ch=8, scale=2),
        RRDBNetSpec(num_feat=12, num_block=2, num_grow_ch=6, scale=4),
    ],
)
def test_regrouped_matches_naive(rng, spec):
    params = init_rrdbnet(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.random((1, 10, 14, 3)).astype(np.float32))
    a = np.asarray(apply_rrdbnet(params, x, spec, naive=True))
    b = np.asarray(apply_rrdbnet(params, x, spec, naive=False))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("scale", [4, 2])
def test_sd_matches_regrouped(rng, scale):
    """The space-to-depth body (ops/sdconv.py) must be numerically
    equivalent to the plain regrouped path."""
    spec = RRDBNetSpec(num_feat=16, num_block=2, num_grow_ch=8, scale=scale)
    params = init_rrdbnet(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.random((1, 12, 16, 3)).astype(np.float32))
    a = np.asarray(apply_rrdbnet(params, x, spec, sd=False))
    b = np.asarray(apply_rrdbnet(params, x, spec, sd=True))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_sd_odd_extent_falls_back(rng):
    spec = RRDBNetSpec(num_feat=16, num_block=1, num_grow_ch=8, scale=4)
    params = init_rrdbnet(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.random((1, 11, 13, 3)).astype(np.float32))
    out = apply_rrdbnet(params, x, spec, sd=True)  # silently uses fine path
    assert out.shape == (1, 44, 52, 3)


def test_regrouped_matches_naive_bf16(rng):
    spec = RRDBNetSpec(num_feat=16, num_block=2, num_grow_ch=8, scale=4)
    params = init_rrdbnet(jax.random.PRNGKey(0), spec, jnp.bfloat16)
    x = jnp.asarray(rng.random((1, 8, 8, 3)), jnp.bfloat16)
    a = np.asarray(apply_rrdbnet(params, x, spec, naive=True)).astype(np.float32)
    b = np.asarray(apply_rrdbnet(params, x, spec, naive=False)).astype(np.float32)
    # bf16 rounding differs slightly between the two summation orders
    assert np.abs(a - b).max() < 0.05


@pytest.mark.parametrize(
    "spec",
    [
        RRDBNetSpec(num_feat=16, num_block=2, num_grow_ch=8, scale=4),
        RRDBNetSpec(num_feat=16, num_block=1, num_grow_ch=8, scale=2),
        RRDBNetSpec(num_feat=12, num_block=2, num_grow_ch=6, scale=4),
    ],
)
def test_accum_matches_naive(rng, spec):
    """The accumulator-form body (zero-padded full-width source convs,
    round-2 production default on TPU) must be numerically equivalent."""
    from video_restore_tpu.models.rrdbnet import _apply

    params = init_rrdbnet(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.random((1, 10, 14, 3)).astype(np.float32))
    a = np.asarray(_apply(params, x, spec.scale, naive=True))
    b = np.asarray(_apply(params, x, spec.scale, accum=True))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_accum_prepared_matches(rng):
    from video_restore_tpu.models.rrdbnet import _apply, prepare_rrdbnet

    spec = RRDBNetSpec(num_feat=16, num_block=2, num_grow_ch=8, scale=4)
    params = init_rrdbnet(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.random((1, 10, 14, 3)).astype(np.float32))
    a = np.asarray(_apply(params, x, spec.scale, naive=True))
    pp = prepare_rrdbnet(params, "accum", spec.num_feat, spec.num_grow_ch)
    b = np.asarray(_apply(pp, x, spec.scale, accum=True, prepared=True))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
