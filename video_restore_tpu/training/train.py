"""Sharded fine-tuning step: data parallelism + tensor (channel) parallelism.

The reference has no training (SURVEY.md §2.4: no TP/PP/SP, no distributed
backend). This module provides the TPU-native training story:

- ``make_train_step``: optax-based (params, opt_state, lr, hr) -> updated
  state, Charbonnier loss, jittable.
- ``shard_train_state``: places params/optimizer state on a 2-axis
  ``Mesh(('dp', 'tp'))`` — conv kernels sharded over output channels on
  'tp' (XLA GSPMD inserts the all-gathers/reduce-scatters on ICI), batch
  sharded over 'dp' (gradient psum inserted automatically).
- ``train_step_sharded``: the jitted, sharding-annotated step used by
  ``__graft_entry__.dryrun_multichip``.

Design note: for conv nets the natural TP axis is the feature/channel
dimension; kernels whose channel count does not divide the tp axis (e.g.
the 3-channel output conv) stay replicated.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_restore_tpu.training.losses import charbonnier_loss


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


def make_train_step(
    apply_fn: Callable[[Any, jax.Array], jax.Array],
    optimizer: optax.GradientTransformation,
    loss_fn: Callable = charbonnier_loss,
):
    """Returns train_step(params, opt_state, lr_batch, hr_batch)."""

    def train_step(params, opt_state, lr, hr):
        def loss(p):
            sr = apply_fn(p, lr)
            return loss_fn(sr, hr)

        loss_val, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_val

    return train_step


def _param_spec(leaf: jax.Array, tp: int) -> P:
    """Shard conv kernels over out-channels on 'tp' when divisible.

    Leaves: conv w (..., kh, kw, cin, cout), bias (..., cout), PReLU alpha.
    A leading stacked-block axis (lax.scan layout) is preserved unsharded.
    """
    if leaf.ndim >= 1 and leaf.shape[-1] % tp == 0 and leaf.shape[-1] >= tp * 4:
        return P(*([None] * (leaf.ndim - 1) + ["tp"]))
    return P()


def shard_train_state(
    params: Any,
    opt_state: Any,
    mesh: Mesh,
) -> Tuple[Any, Any, Any]:
    """Place params + optimizer state on the mesh; returns
    (params, opt_state, param_shardings)."""
    tp = mesh.shape["tp"]
    specs = jax.tree.map(lambda l: _param_spec(l, tp), params)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
    params = jax.tree.map(jax.device_put, params, shardings)

    # optimizer state mirrors param shapes where possible (adam mu/nu);
    # scalars and counters are replicated.
    def opt_sharding(leaf):
        spec = _param_spec(leaf, tp) if hasattr(leaf, "ndim") else P()
        return NamedSharding(mesh, spec)

    opt_state = jax.tree.map(
        lambda l: jax.device_put(l, opt_sharding(l)), opt_state
    )
    return params, opt_state, shardings


def train_step_sharded(
    apply_fn: Callable[[Any, jax.Array], jax.Array],
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    params: Any,
    opt_state: Any,
):
    """Compile the train step with dp-sharded batch and tp-sharded params.

    Returns (jitted_step, placed_params, placed_opt_state).
    """
    params, opt_state, param_shardings = shard_train_state(
        params, opt_state, mesh
    )
    opt_shardings = jax.tree.map(lambda l: l.sharding, opt_state)
    batch_sharding = NamedSharding(mesh, P("dp"))
    scalar = NamedSharding(mesh, P())

    step = jax.jit(
        make_train_step(apply_fn, optimizer),
        in_shardings=(param_shardings, opt_shardings, batch_sharding,
                      batch_sharding),
        out_shardings=(param_shardings, opt_shardings, scalar),
        donate_argnums=(0, 1),
    )
    return step, params, opt_state


# ---------------------------------------------------------------------------
# Degrade-on-the-fly paired patch sampling (Real-ESRGAN-style, light)
# ---------------------------------------------------------------------------


def degrade_batch(
    key: jax.Array, hr: jax.Array, scale: int
) -> jax.Array:
    """Produce LR inputs from HR patches: area downscale + Gaussian noise +
    slight blur — a light version of the classic SR degradation pipeline."""
    from video_restore_tpu.ops.post import gaussian_blur

    n, h, w, c = hr.shape
    k1, k2 = jax.random.split(key)
    blurred = gaussian_blur(hr, 0.8, 2)
    lr = jax.image.resize(
        blurred, (n, h // scale, w // scale, c), method="linear"
    )
    noise = jax.random.normal(k2, lr.shape, lr.dtype) * 0.01
    return jnp.clip(lr + noise, 0.0, 1.0)


def save_checkpoint(path, params: Any, opt_state: Any, step: int) -> None:
    """Orbax checkpoint of the full training state (resumable)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(
        str(path),
        {"params": params, "opt_state": opt_state, "step": step},
        force=True,
    )


def restore_checkpoint(path, template: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(str(path), item=template)


class Trainer:
    """Minimal fine-tuning loop over frames from the user's own footage."""

    def __init__(
        self,
        apply_fn: Callable,
        params: Any,
        scale: int,
        learning_rate: float = 1e-4,
        mesh: Optional[Mesh] = None,
    ):
        self.apply_fn = apply_fn
        self.scale = scale
        self.optimizer = optax.adam(learning_rate)
        self.opt_state = self.optimizer.init(params)
        self.params = params
        if mesh is not None:
            self._step, self.params, self.opt_state = train_step_sharded(
                apply_fn, self.optimizer, mesh, params, self.opt_state
            )
        else:
            self._step = jax.jit(make_train_step(apply_fn, self.optimizer))
        self.losses = []

    def fit_patches(self, hr_patches: np.ndarray, steps: int, seed: int = 0):
        """hr_patches: (N, H, W, 3) float32 in [0,1], H/W divisible by
        scale. Each step samples a batch, degrades it, and minimizes the
        Charbonnier loss."""
        key = jax.random.PRNGKey(seed)
        n = hr_patches.shape[0]
        for i in range(steps):
            key, k1, k2 = jax.random.split(key, 3)
            idx = jax.random.randint(k1, (min(8, n),), 0, n)
            hr = jnp.asarray(hr_patches)[idx]
            lr = degrade_batch(k2, hr, self.scale)
            self.params, self.opt_state, loss = self._step(
                self.params, self.opt_state, lr, hr
            )
            self.losses.append(float(loss))
        return self.params
