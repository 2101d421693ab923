"""__graft_entry__ contract: entry() must be jittable with its example
args, and dryrun_multichip must execute a full sharded step in-process
(conftest provisions the 8-device CPU mesh)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def test_entry_shapes():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    params, x = args
    n, h, w, c = x.shape
    assert out.shape == (n, h * 4, w * 4, c)
    assert out.dtype in (jnp.float32, jnp.bfloat16)


def test_entry_executes():
    """Run the jitted entry fn numerically — the driver's compile check."""
    import __graft_entry__ as ge

    fn, (params, x) = ge.entry()
    out = np.asarray(jax.jit(fn)(params, x))
    n, h, w, c = x.shape
    assert out.shape == (n, h * 4, w * 4, c)
    assert np.all(np.isfinite(out.astype(np.float32)))


def test_dryrun_multichip_inprocess():
    """Execute the full driver contract on 2 of the virtual CPU devices."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(2)


def test_dryrun_provisioning_helper():
    """The self-provisioning check must accept the conftest-provisioned
    CPU mesh (backend already initialized with >= n devices)."""
    import __graft_entry__ as ge

    assert ge._provision_virtual_devices(8)
