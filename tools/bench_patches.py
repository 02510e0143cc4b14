"""Micro-benchmark of the patch-based terrain pipeline on the real TPU.

Times the two surviving ops from go2_rl_gym_tpu/ops/terrain_patches.py at
production shapes: extract_patches (N windowed slices of the (3, C, R) grid,
once per policy step) and lookup (in-patch one-hot contraction, the
per-substep hot path).

Run under `timeout`; usage: python tools/bench_patches.py [extract|lookup|all]
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
P_CONTACT = 78     # geoms per env (contact narrow-phase)
P_SCAN = 187       # observation height-scan points


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    h = rng.normal(size=(R, C)).astype(np.float32) * 0.1
    channels = jnp.asarray(tp.build_channels(h, 0.05))      # (3, C, R)
    base_ix = jnp.asarray(rng.integers(0, R, size=N), jnp.int32)
    base_iy = jnp.asarray(rng.integers(0, C, size=N), jnp.int32)
    origins = tp.compute_origins(base_ix, base_iy, R, C)

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "extract"):
        f = jax.jit(tp.extract_patches)
        print(f"extract_patches (N={N}):      {timeit(f, channels, origins):8.3f} ms")

    if which in ("all", "lookup"):
        patches = jax.jit(tp.extract_patches)(channels, origins)
        for P in (P_CONTACT, P_SCAN):
            ix = jnp.asarray(rng.integers(0, R, size=(N, P)), jnp.int32)
            iy = jnp.asarray(rng.integers(0, C, size=(N, P)), jnp.int32)
            f = jax.jit(tp.lookup)
            ms = timeit(f, patches, origins, ix, iy)
            print(f"lookup (N={N}, P={P:4d}):       {ms:8.3f} ms")


if __name__ == "__main__":
    main()
