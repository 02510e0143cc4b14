"""Patch-based terrain pipeline — kills the heightfield-gather bottleneck.

The env and engine sample terrain heights/slopes at hundreds of thousands of
data-dependent (x, y) points per policy step (contact narrow-phase: 78 geoms
x N envs x 4 substeps; observation scan: 187 points x N envs). XLA lowers
these as global gathers over the ~3M-cell grid — random HBM access measured
at ~20 ns/element on v5e (19.4 ms for one 78-point min-of-3 query set at
4096 envs).

Replacement (reference semantics: legged_robot.py:1218-1222 min-of-3):
1. At terrain build, precompute a channel-major (3, C, R) grid (x minor,
   see build_channels) [hmin, dx, dy] where hmin is the reference's min-of-3
   height and dx/dy are forward-difference slopes
   (surface normal = normalize(-dx, -dy, 1)).
   Channel-major matters: a trailing dim of 3 would be padded to the 128
   TPU lanes (40x HBM blowup) and blocks DMA/layout optimizations.
2. Once per policy step, slice a (3, PATCH, PATCH) window around each env's
   base into a dense (N, 3, PATCH*PATCH) array (robots move <= 4 cm per
   20 ms policy step, so one window serves all 4 substeps AND the 187-point
   observation scan).
3. Every query becomes an in-patch one-hot contraction — no data-dependent
   HBM access in the hot loop.

Round-1 lesson: the obvious (R, C, 3) layout + scan-of-dynamic-slices cost
10.6 ms/step *in context* (layout-assignment padded the trailing 3 to 128
lanes and the scan's dynamic-update-slice wrote strided tiles) even though
the same code microbenchmarked at 0.035 ms standalone. Channel-major (3, R,
C) with a flat (N, 3*PATCH*PATCH) row per env keeps every write contiguous.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

PATCH = 32


def build_channels(height_m: np.ndarray, horizontal_scale: float) -> np.ndarray:
    """(R, C) heights -> channel-major (3, R, C) [hmin, dx, dy] grid."""
    h = np.asarray(height_m, np.float32)
    hx = np.roll(h, -1, axis=0)
    hx[-1] = h[-1]
    hy = np.roll(h, -1, axis=1)
    hy[:, -1] = h[:, -1]
    hmin = np.minimum(np.minimum(h, hx), hy)
    dx = (hx - h) / horizontal_scale
    dy = (hy - h) / horizontal_scale
    # (3, C, R): x (rows of the heightfield) minor — matches the layout XLA
    # picks for the fast windowed-slice lowering, so no in-context relayout
    return np.ascontiguousarray(np.stack([hmin, dx, dy], axis=0)
                                .transpose(0, 2, 1))


def compute_origins(base_ix, base_iy, R, C):
    """Clamped patch-corner cells. base_ix/iy: (N,) int32 -> (N, 2)."""
    ox = jnp.clip(base_ix - PATCH // 2, 0, R - PATCH)
    oy = jnp.clip(base_iy - PATCH // 2, 0, C - PATCH)
    return jnp.stack([ox, oy], axis=1)


def extract_patches(channels: jax.Array, origins: jax.Array) -> jax.Array:
    """(3, R, C), (N, 2) -> (N, 3, PATCH*PATCH) patch windows.

    vmap(dynamic_slice) lowers to ONE HLO gather with slice_sizes
    (3, PATCH, PATCH): N big contiguous-row window copies, measured at HBM
    bandwidth (0.018 ms at N=4096) on v5e. (A lax.scan of the same slices
    also microbenchmarks fine but resists fusion-boundary rewrites in a
    larger program — the round-1 build lost 11 ms/step to exactly that.)"""
    N = origins.shape[0]

    def one(o):
        # channels is (3, C, R): slice (y, x) windows
        return jax.lax.dynamic_slice(channels, (0, o[1], o[0]),
                                     (3, PATCH, PATCH))
    return jax.vmap(one)(origins).reshape(N, 3, PATCH * PATCH)


def lookup(patches: jax.Array, origins: jax.Array, ix: jax.Array,
           iy: jax.Array):
    """In-patch query: (N, 3, PATCH*PATCH) x (N, P) cells -> 3 x (N, P).

    ix/iy are absolute grid cells; clamped into the patch window. Returns
    (hmin, dx, dy) each (N, P)."""
    lx = jnp.clip(ix - origins[:, 0:1], 0, PATCH - 1)
    ly = jnp.clip(iy - origins[:, 1:2], 0, PATCH - 1)
    lin = ly * PATCH + lx                  # patches are (y, x) windows

    onehot = jax.nn.one_hot(lin, PATCH * PATCH, dtype=jnp.float32)
    # HIGHEST: default TPU matmul truncates the height data to bf16 (mm-cm
    # error vs the 1e-4 m contact-gap threshold); the one-hot is exact
    vals = jnp.einsum("npc,nkc->nkp", onehot, patches,
                      precision=jax.lax.Precision.HIGHEST)   # (N, 3, P)
    return vals[:, 0], vals[:, 1], vals[:, 2]
