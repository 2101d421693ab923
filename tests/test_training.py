"""Training subsystem: loss decreases, metrics sane, sharded step runs."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from jax.sharding import Mesh

from video_restore_tpu.models.srvgg import SRVGGSpec, apply_srvgg, init_srvgg
from video_restore_tpu.training.losses import charbonnier_loss, l1_loss, psnr, ssim
from video_restore_tpu.training.train import (
    Trainer,
    make_train_step,
    train_step_sharded,
)


def test_losses_and_metrics(rng):
    a = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    b = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    assert float(l1_loss(a, a)) == 0.0
    assert float(charbonnier_loss(a, a)) < 1e-5
    assert float(l1_loss(a, b)) > 0
    assert float(psnr(a, a)) > 100
    assert float(ssim(a, a)) > 0.999
    assert float(ssim(a, b)) < 0.9


def test_train_step_reduces_loss(rng):
    spec = SRVGGSpec(num_feat=8, num_conv=2, scale=2)
    params = init_srvgg(jax.random.PRNGKey(0), spec)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(lambda p, x: apply_srvgg(p, x, spec), opt))

    # smooth (learnable) targets: blurred noise, not raw noise
    from video_restore_tpu.ops.post import gaussian_blur

    hr = gaussian_blur(
        jnp.asarray(rng.random((4, 16, 16, 3)).astype(np.float32)), 2.0, 4
    )
    lr = jax.image.resize(hr, (4, 8, 8, 3), "linear")
    losses = []
    for _ in range(40):
        params, opt_state, loss = step(params, opt_state, lr, hr)
        losses.append(float(loss))
    # loss must improve monotonically-ish toward its floor
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    assert losses[-1] == min(losses)


def test_sharded_train_step_dp_tp(rng):
    """dp=4, tp=2 over the 8 virtual devices; one full step must run and
    produce a finite loss with params still sharded."""
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, axis_names=("dp", "tp"))
    spec = SRVGGSpec(num_feat=8, num_conv=2, scale=2)
    params = init_srvgg(jax.random.PRNGKey(0), spec)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    with mesh:
        step, params, opt_state = train_step_sharded(
            lambda p, x: apply_srvgg(p, x, spec), opt, mesh, params, opt_state
        )
        hr = jnp.asarray(rng.random((8, 16, 16, 3)).astype(np.float32))
        lr = jax.image.resize(hr, (8, 8, 8, 3), "linear")
        params, opt_state, loss = step(params, opt_state, lr, hr)
    assert np.isfinite(float(loss))
    # body conv kernels (cout=8 >= 4*tp) must actually be tp-sharded
    body_w = params["body"]["w"]
    spec_str = str(body_w.sharding.spec)
    assert "tp" in spec_str, spec_str


def test_trainer_fit(rng):
    spec = SRVGGSpec(num_feat=8, num_conv=2, scale=2)
    params = init_srvgg(jax.random.PRNGKey(0), spec)
    tr = Trainer(lambda p, x: apply_srvgg(p, x, spec), params, scale=2,
                 learning_rate=1e-3)
    hr = rng.random((8, 16, 16, 3)).astype(np.float32)
    tr.fit_patches(hr, steps=5)
    assert len(tr.losses) == 5
    assert all(np.isfinite(l) for l in tr.losses)


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_grad_with_kernels_forced(monkeypatch, rng):
    """Training must not autodiff through the Pallas kernels: with the
    TPU production defaults forced on (VRT_STRIPE/VRT_TAIL_KERNEL=1),
    the differentiable apply path still takes gradients."""
    import jax
    import jax.numpy as jnp

    from video_restore_tpu.models.rrdbnet import RRDBNetSpec, init_rrdbnet
    from video_restore_tpu.models.zoo import ModelHandle

    monkeypatch.setenv("VRT_STRIPE", "1")
    monkeypatch.setenv("VRT_TAIL_KERNEL", "1")
    spec = RRDBNetSpec(num_feat=8, num_block=1, num_grow_ch=4)
    params = init_rrdbnet(jax.random.PRNGKey(0), spec)
    m = ModelHandle("t", spec, params)
    fn = m.apply_fn(differentiable=True)
    x = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))

    def loss(p):
        return jnp.mean(fn(p, x) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in leaves)
    assert any(np.abs(np.asarray(leaf)).max() > 0 for leaf in leaves)
