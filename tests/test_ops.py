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
    h = np.arange(12, dtype=np.float32).reshape(3, 4) * 0.005
    ch = tp.build_channels(h, 0.1)                           # (3, C', R')
    # hmin at (x=0, y=0): min(h[0,0], h[1,0], h[0,1]) = min(0, .02, .005) = 0
    assert ch[0, 0, 0] == 0.0
    # slopes are CENTERED differences of hmin (matching the direct path's
    # _terrain_normal_t): at the x=0 edge, (hmin[1,0]-hmin[0,0])/(2*0.1)
    # with edge padding; hmin[1,0] = min(.02, .04, .025) = .02 -> dx = 0.1
    np.testing.assert_allclose(ch[1, 0, 0], 0.1, atol=1e-6)
    # dy: (hmin[0,1]-hmin[0,0])/(2*0.1); hmin[0,1] = min(.005,.025,.01)=.005
    np.testing.assert_allclose(ch[2, 0, 0], 0.025, atol=1e-6)
    # padded region replicates the edge values
    np.testing.assert_allclose(ch[0, 3, 2], ch[0, -1, -1])


def test_build_channels_riser_snap():
    """One-cell jumps above RISER_SLOPE_THRESHOLD (the reference's trimesh
    slope correction, legged_robot_config.py:40) zero the slope channels —
    stair risers present the vertical tread normal — while walkable slopes
    keep their centered-difference gradient."""
    s = 0.1
    # stairs along x: 3-cell treads, 0.12 m risers (level-3 class) — a
    # one-cell grade of 1.2 > 0.75, but a CENTERED grade of only 0.6
    R, C = 24, 8
    h = np.repeat(np.arange(R // 3, dtype=np.float32) * 0.12, 3)[:, None]
    h = np.broadcast_to(h, (R, C)).copy()
    ch = tp.build_channels(h, s)                             # (3, C', R')
    hmin = np.minimum(np.minimum(h, np.vstack([h[1:], h[-1:]])), h)
    # cells adjacent to a riser (one-cell jump 1.2): slope channels snap to 0
    jump = np.abs(np.diff(np.pad(hmin[:, 4], 1, mode="edge"))) / s
    riser_cells = np.maximum(jump[:-1], jump[1:]) > tp.RISER_SLOPE_THRESHOLD
    assert riser_cells.any()
    np.testing.assert_array_equal(ch[1, 4, :R][riser_cells], 0.0)
    np.testing.assert_array_equal(ch[2, 4, :R][riser_cells], 0.0)
    # a 0.4-grade slope (walkable; reference slopes stay below 0.75*scale
    # per cell) is untouched
    hs = (np.arange(R, dtype=np.float32) * 0.04)[:, None]
    hs = np.broadcast_to(hs, (R, C)).copy()
    chs = tp.build_channels(hs, s)
    np.testing.assert_allclose(chs[1, 4, 2:R - 2], 0.4, atol=1e-5)


def test_direct_normal_matches_channels_at_riser():
    """tengine._terrain_normal_t applies the same riser snap as the channel
    path: vertical at risers, tilted on real slopes."""
    from go2_rl_gym_tpu.sim.engine import make_terrain_data, terrain_normal
    from go2_rl_gym_tpu.sim.tengine import _terrain_normal_t
    s = 0.1
    R, C = 24, 16
    h = np.repeat(np.arange(R // 3, dtype=np.float32) * 0.12, 3)[:, None]
    h = np.broadcast_to(h, (R, C)).copy()
    terrain = make_terrain_data(h, s, border_size=0.0)
    # query a point whose cell straddles a riser (cell 2 -> jump to cell 3)
    x = jnp.asarray([[0.25, 0.15]])          # (1, N=2): riser cell, tread cell
    y = jnp.asarray([[0.55, 0.55]])
    n = np.asarray(_terrain_normal_t(terrain, x, y))[0]      # (3, 2)
    np.testing.assert_allclose(n[:, 0], [0.0, 0.0, 1.0], atol=1e-6)
    # the oracle engine path agrees
    n2 = np.asarray(terrain_normal(terrain, jnp.asarray([[0.25, 0.55]])))[0]
    np.testing.assert_allclose(n2, [0.0, 0.0, 1.0], atol=1e-6)
    # walkable slope: unchanged tilted normal on both paths
    hs = (np.arange(R, dtype=np.float32) * 0.04)[:, None]
    hs = np.broadcast_to(hs, (R, C)).copy()
    ts = make_terrain_data(hs, s, border_size=0.0)
    ns = np.asarray(_terrain_normal_t(ts, jnp.asarray([[1.0]]),
                                      jnp.asarray([[0.8]])))[0, :, 0]
    expect = np.array([-0.4, 0.0, 1.0]) / np.linalg.norm([-0.4, 0.0, 1.0])
    np.testing.assert_allclose(ns, expect, atol=1e-5)
