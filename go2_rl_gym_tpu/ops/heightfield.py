"""Pallas TPU kernel: batched local-patch heightfield lookup.

The env and engine sample terrain heights at hundreds of thousands of
data-dependent (x, y) points per step (contact narrow-phase: 78 geoms x N
envs x 4 substeps; observation scan: 187 points x N envs). XLA lowers these
as global gathers over the ~29M-cell heightfield — random HBM access.

This kernel exploits locality: all of one env's query points lie within ~1 m
of its base. Per env it DMAs a small (PATCH x PATCH) window of the grid into
VMEM and resolves every query inside the window as a one-hot matmul (a
(P, PATCH*PATCH) selector against the flattened patch — MXU-friendly, no
serialized per-element gathers).

Returns exactly the reference's min-of-3 semantics
(legged_robot.py:1218-1222): min(h[i,j], h[i+1,j], h[i,j+1]).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAS_PALLAS = True
except ImportError:  # pragma: no cover
    HAS_PALLAS = False

PATCH = 32            # cells per side; 3.2 m at 0.1 m resolution


def _kernel(origin_ref, ix_ref, iy_ref, grid_ref, out_ref, patch_ref, sem):
    """One grid step = one env. origin (2,): patch corner cell; ix/iy (P,):
    query cells (absolute); grid: full heightfield in HBM; out (P,)."""
    ox = origin_ref[0]
    oy = origin_ref[1]
    copy = pltpu.make_async_copy(
        grid_ref.at[pl.ds(ox, PATCH), pl.ds(oy, PATCH)], patch_ref, sem)
    copy.start()
    copy.wait()
    patch = patch_ref[:].reshape(1, PATCH * PATCH)

    lx = ix_ref[:] - ox                       # (P,) local cells
    ly = iy_ref[:] - oy
    P = lx.shape[0]

    def lookup(dx, dy):
        lin = (lx + dx) * PATCH + (ly + dy)   # (P,)
        cols = jax.lax.broadcasted_iota(jnp.int32, (P, PATCH * PATCH), 1)
        onehot = (cols == lin[:, None]).astype(jnp.float32)
        return jnp.sum(onehot * patch, axis=1)

    h1 = lookup(0, 0)
    h2 = lookup(1, 0)
    h3 = lookup(0, 1)
    out_ref[:] = jnp.minimum(jnp.minimum(h1, h2), h3)


def patch_lookup(height_grid: jax.Array, ix: jax.Array, iy: jax.Array,
                 base_ix: jax.Array, base_iy: jax.Array,
                 interpret: bool = False) -> jax.Array:
    """Min-of-3 heightfield lookup via per-env VMEM patches.

    height_grid: (R, C) f32. ix, iy: (N, P) absolute query cells (assumed
    within PATCH-2 of the env base cell). base_ix/base_iy: (N,) env base
    cells. Returns (N, P) heights.
    """
    N, P = ix.shape
    R, C = height_grid.shape
    origin = jnp.stack([
        jnp.clip(base_ix - PATCH // 2, 0, R - PATCH - 1),
        jnp.clip(base_iy - PATCH // 2, 0, C - PATCH - 1)], axis=1)
    ixc = jnp.clip(ix, origin[:, 0:1], origin[:, 0:1] + PATCH - 2)
    iyc = jnp.clip(iy, origin[:, 1:2], origin[:, 1:2] + PATCH - 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(N,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, P), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((PATCH, PATCH), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )

    def kernel(origin_all, ix_all, iy_all, grid_ref, out_ref, patch, sem):
        i = pl.program_id(0)
        ox = origin_all[i, 0]
        oy = origin_all[i, 1]
        copy = pltpu.make_async_copy(
            grid_ref.at[pl.ds(ox, PATCH), pl.ds(oy, PATCH)], patch, sem)
        copy.start()
        copy.wait()
        flat = patch[:].reshape(1, PATCH * PATCH)
        lx = ix_all[i] - ox
        ly = iy_all[i] - oy

        def lookup(dx, dy):
            lin = (lx + dx) * PATCH + (ly + dy)
            cols = jax.lax.broadcasted_iota(jnp.int32, (P, PATCH * PATCH), 1)
            onehot = (cols == lin[:, None]).astype(jnp.float32)
            return jnp.sum(onehot * flat, axis=1)

        h = jnp.minimum(jnp.minimum(lookup(0, 0), lookup(1, 0)), lookup(0, 1))
        out_ref[0, :] = h

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, P), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(origin, ixc, iyc, height_grid)
