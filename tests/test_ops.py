"""Patch-based terrain pipeline: extract_patches + lookup vs a plain gather
over the full grid (reference min-of-3 semantics, legged_robot.py:1218-1222)."""
import jax
import jax.numpy as jnp
import numpy as np

from go2_rl_gym_tpu.ops import terrain_patches as tp


def _setup(seed=0, N=16, R=128, C=96):
    rng = np.random.default_rng(seed)
    h = rng.normal(size=(R, C)).astype(np.float32) * 0.1
    channels = tp.build_channels(h, horizontal_scale=0.05)   # (3, C', R')
    Cp, Rp = channels.shape[1:]
    assert (Cp, Rp) >= (C, R) and Cp % 8 == 0 and Rp % 128 == 0
    np.testing.assert_array_equal(channels[:, C - 1, R - 1],
                                  channels[:, -1, -1])       # edge replicate
    base_ix = rng.integers(0, R, size=N).astype(np.int32)
    base_iy = rng.integers(0, C, size=N).astype(np.int32)
    origins = tp.compute_origins(jnp.asarray(base_ix), jnp.asarray(base_iy),
                                 Rp, Cp)
    patches = tp.extract_patches(jnp.asarray(channels), origins)
    return h, channels, origins, patches, (Rp, Cp), rng


def test_pallas_extraction_matches_xla():
    """The DMA kernel (interpret mode on CPU) is bit-exact vs the XLA path,
    including origins that force clamped aligned windows at every edge."""
    _, channels, origins, _, (Rp, Cp), rng = _setup(N=40)
    edge = jnp.asarray([[0, 0], [Rp - tp.PATCH, Cp - tp.PATCH],
                        [0, Cp - tp.PATCH], [Rp - tp.PATCH, 0]], jnp.int32)
    origins = jnp.concatenate([origins, edge])
    a = tp.extract_patches_xla(jnp.asarray(channels), origins)
    b = tp.extract_patches_pallas(jnp.asarray(channels), origins,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(a),
                                  np.asarray(b).reshape(a.shape))


def test_lookup_matches_global_gather():
    h, channels, origins, patches, (R, C), rng = _setup()
    N = origins.shape[0]
    P = 7
    # queries inside each env's patch window
    lx = rng.integers(0, tp.PATCH, size=(N, P))
    ly = rng.integers(0, tp.PATCH, size=(N, P))
    ix = np.asarray(origins)[:, 0:1] + lx
    iy = np.asarray(origins)[:, 1:2] + ly
    hmin, dx, dy = jax.jit(tp.lookup)(patches, origins,
                                      jnp.asarray(ix), jnp.asarray(iy))
    ref = np.asarray(channels)[:, iy, ix]                    # (3, N, P)
    np.testing.assert_allclose(np.asarray(hmin), ref[0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(dx), ref[1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(dy), ref[2], atol=1e-6)


def test_lookup_clamps_out_of_patch():
    _, channels, origins, patches, (R, C), _ = _setup()
    N = origins.shape[0]
    # queries far outside the window clamp to the window edge (no NaN/garbage)
    ix = jnp.full((N, 2), 10_000, jnp.int32)
    iy = jnp.full((N, 2), -10_000, jnp.int32)
    hmin, _, _ = tp.lookup(patches, origins, ix, iy)
    edge_x = np.asarray(origins)[:, 0] + tp.PATCH - 1
    edge_y = np.asarray(origins)[:, 1]
    ref = np.asarray(channels)[0, edge_y, edge_x]
    np.testing.assert_allclose(np.asarray(hmin[:, 0]), ref, atol=1e-6)


def test_build_channels_min_of_three():
    h = np.arange(12, dtype=np.float32).reshape(3, 4)
    ch = tp.build_channels(h, 0.1)                           # (3, C', R')
    # hmin at (x=0, y=0): min(h[0,0], h[1,0], h[0,1]) = min(0, 4, 1) = 0
    assert ch[0, 0, 0] == 0.0
    # slopes are CENTERED differences of hmin (matching the direct path's
    # _terrain_normal_t): at the x=0 edge, (hmin[1,0]-hmin[0,0])/(2*0.1)
    # with edge padding; hmin[1,0] = min(4, 8, 5) = 4 -> dx = 20
    np.testing.assert_allclose(ch[1, 0, 0], 20.0)
    # dy: (hmin[0,1]-hmin[0,0])/(2*0.1); hmin[0,1] = min(1, 5, 2) = 1 -> 5
    np.testing.assert_allclose(ch[2, 0, 0], 5.0)
    # padded region replicates the edge values
    np.testing.assert_allclose(ch[0, 3, 2], ch[0, -1, -1])
