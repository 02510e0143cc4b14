"""Micro-benchmark of patch-extraction strategies on the real TPU.

Compares: pallas DMA kernel, scan-of-dynamic-slices, tiled row-gather.
Run with timeout in case mosaic hangs the relay compile.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from go2_rl_gym_tpu.ops import terrain_patches as tp

N = 4096
R, C = 2120, 2120  # ~full rough terrain grid (10x20 subterrains of 8m @0.05)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3


def main():
    key = jax.random.PRNGKey(0)
    channels = jax.random.normal(key, (R, C, 3), jnp.float32)
    ox = jax.random.randint(key, (N,), 0, R - tp.PATCH)
    oy = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, C - tp.PATCH)
    origins = jnp.stack([ox, oy], axis=1)

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "xla"):
        f = jax.jit(tp.extract_patches_xla)
        print(f"xla scan:   {timeit(f, channels, origins):8.3f} ms")
    if which in ("all", "pallas"):
        f = jax.jit(tp.extract_patches_pallas)
        print(f"pallas dma: {timeit(f, channels, origins):8.3f} ms")
    if which in ("all", "gather"):
        # tiled row-gather: quantize origins to stride-16, gather 48x48 tiles
        STRIDE, TILE = 16, 48
        Rq = (R - TILE) // STRIDE + 1
        Cq = (C - TILE) // STRIDE + 1

        def build_tiles(ch):
            # (Rq, Cq, TILE, TILE, 3) precomputed once at terrain build
            i = np.arange(Rq) * STRIDE
            j = np.arange(Cq) * STRIDE
            return None  # host-side; here just index on device

        # device-side tile table
        ii = (jnp.arange(Rq) * STRIDE)[:, None] + jnp.arange(TILE)[None, :]
        jj = (jnp.arange(Cq) * STRIDE)[:, None] + jnp.arange(TILE)[None, :]
        tiles = channels[ii][:, :, jj]          # (Rq, TILE, Cq, TILE, 3)
        tiles = jnp.moveaxis(tiles, 1, 2)       # (Rq, Cq, TILE, TILE, 3)
        tiles_flat = tiles.reshape(Rq * Cq, TILE * TILE * 3)
        jax.block_until_ready(tiles_flat)
        print(f"tile table: {tiles_flat.nbytes/1e6:.0f} MB")

        def gather(tiles_flat, origins):
            ti = jnp.clip(origins[:, 0] // STRIDE, 0, Rq - 1)
            tj = jnp.clip(origins[:, 1] // STRIDE, 0, Cq - 1)
            out = jnp.take(tiles_flat, ti * Cq + tj, axis=0)
            return out.reshape(N, TILE, TILE, 3)

        f = jax.jit(gather)
        print(f"row gather: {timeit(f, tiles_flat, origins):8.3f} ms")


if __name__ == "__main__":
    main()
