"""__graft_entry__ contract: entry() must be jittable with its example
args (validated via eval_shape — no compilation), dryrun is covered in
test_training."""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def test_entry_shapes():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    params, x = args
    n, h, w, c = x.shape
    assert out.shape == (n, h * 4, w * 4, c)
    assert out.dtype in (jnp.float32, jnp.bfloat16)
