"""Pallas heightfield-patch kernel vs plain gather (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go2_rl_gym_tpu.ops import heightfield as hfop

pytestmark = pytest.mark.skipif(not hfop.HAS_PALLAS, reason="no pallas")


def test_patch_lookup_matches_gather():
    key = jax.random.PRNGKey(0)
    grid = jax.random.normal(key, (200, 300))
    N, P = 16, 78
    base_ix = jax.random.randint(jax.random.PRNGKey(1), (N,), 40, 160)
    base_iy = jax.random.randint(jax.random.PRNGKey(2), (N,), 40, 260)
    ix = base_ix[:, None] + jax.random.randint(jax.random.PRNGKey(3), (N, P), -10, 10)
    iy = base_iy[:, None] + jax.random.randint(jax.random.PRNGKey(4), (N, P), -10, 10)
    out = hfop.patch_lookup(grid, ix, iy, base_ix, base_iy, interpret=True)
    want = jnp.minimum(jnp.minimum(grid[ix, iy], grid[ix + 1, iy]),
                       grid[ix, iy + 1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)


def test_patch_lookup_clamps_out_of_patch():
    """Points outside the patch window are clamped, not OOB-read."""
    grid = jnp.zeros((100, 100))
    N, P = 2, 4
    base = jnp.array([50, 50])
    ix = jnp.array([[0, 99, 50, 50], [50, 50, 0, 99]])
    iy = jnp.array([[50, 50, 0, 99], [0, 99, 50, 50]])
    out = hfop.patch_lookup(grid, ix, iy, base, base, interpret=True)
    assert bool(jnp.isfinite(out).all())
