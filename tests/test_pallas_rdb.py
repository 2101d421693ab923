"""Fused Pallas RDB kernel vs the XLA regrouped reference (interpret mode
on CPU — the kernel-correctness strategy SURVEY.md §4 calls for)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_restore_tpu.models.rrdbnet import (
    RRDBNetSpec,
    _rdb_apply,
    _regroup_rdb_weights,
    init_rrdbnet,
)
from video_restore_tpu.ops.pallas_rdb import rdb_fused


def _one_rdb(nf=16, gc=8, seed=0):
    spec = RRDBNetSpec(num_feat=nf, num_block=1, num_grow_ch=gc)
    params = init_rrdbnet(jax.random.PRNGKey(seed), spec)
    rdb = jax.tree.map(lambda a: a[0], params["body"]["rdb1"])
    ws, bs = _regroup_rdb_weights(rdb, nf, gc)
    return rdb, tuple(ws), tuple(bs)


@pytest.mark.parametrize("shape", [(1, 32, 32), (2, 64, 48), (1, 40, 56)])
def test_rdb_fused_matches_reference(rng, shape):
    b, h, w = shape
    rdb, ws, bs = _one_rdb()
    x = jnp.asarray(rng.random((b, h, w, 16)).astype(np.float32))
    ref = np.asarray(_rdb_apply(rdb, x))
    out = np.asarray(rdb_fused(x, ws, bs, interpret=True))
    assert out.shape == ref.shape
    # interpret mode emulates the MXU's bf16-granular f32 matmul, so f32
    # agreement is at bf16-ish resolution, not exact
    np.testing.assert_allclose(out, ref, rtol=5e-2, atol=5e-3)


def test_rdb_fused_bf16(rng):
    rdb, ws, bs = _one_rdb()
    x = jnp.asarray(rng.random((1, 32, 32, 16)), jnp.bfloat16)
    ref = np.asarray(_rdb_apply(rdb, x)).astype(np.float32)
    out = np.asarray(rdb_fused(x, ws, bs, interpret=True)).astype(np.float32)
    assert np.abs(out - ref).max() < 0.05


def test_rrdb_fused_matches_reference(rng):
    """Whole-RRDB fusion vs the XLA regrouped reference."""
    from video_restore_tpu.models.rrdbnet import (
        _rrdb_apply_regrouped,
        init_rrdbnet,
    )
    from video_restore_tpu.ops.pallas_rdb import rrdb_fused

    nf, gc = 16, 8
    spec = RRDBNetSpec(num_feat=nf, num_block=1, num_grow_ch=gc)
    params = init_rrdbnet(jax.random.PRNGKey(2), spec)
    block = jax.tree.map(lambda a: a[0], params["body"])
    tp = {}
    for r in ("rdb1", "rdb2", "rdb3"):
        ws, bs = _regroup_rdb_weights(block[r], nf, gc)
        tp[r] = {"w": tuple(ws), "b": tuple(bs)}
    x = jnp.asarray(rng.random((1, 40, 48, nf)).astype(np.float32))
    ref = np.asarray(_rrdb_apply_regrouped(tp, x))
    out = np.asarray(rrdb_fused(x, tp, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=5e-2, atol=5e-3)


def test_full_model_pallas_path_interpret(rng):
    """apply_rrdbnet(use_pallas=True) through interpret-mode pallas must
    agree with the XLA path end to end."""
    from unittest import mock

    import video_restore_tpu.ops.pallas_rdb as pk
    from video_restore_tpu.models.rrdbnet import apply_rrdbnet

    spec = RRDBNetSpec(num_feat=16, num_block=2, num_grow_ch=8, scale=4)
    params = init_rrdbnet(jax.random.PRNGKey(1), spec)
    x = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    ref = np.asarray(apply_rrdbnet(params, x, spec, use_pallas=False))

    orig = pk.rrdb_fused

    def interp(xx, tp, interpret=False):
        return orig(xx, tp, interpret=True)

    with mock.patch.object(pk, "rrdb_fused", interp):
        out = np.asarray(apply_rrdbnet(params, x, spec, use_pallas=True))
    np.testing.assert_allclose(out, ref, rtol=5e-2, atol=5e-3)
