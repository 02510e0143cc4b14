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

import os

import jax
import jax.numpy as jnp
import numpy as np

PATCH = 32

# Slopes above this are risers/cliffs, not walkable inclines: the reference
# corrects them to VERTICAL surfaces when converting the heightfield to the
# PhysX trimesh (legged_robot_config.py:40 `slope_treshold = 0.75`,
# terrain.py:49 via isaacgym's convert_heightfield_to_trimesh), so ascending
# feet there push against flat treads + vertical walls. Our heightfield
# contact applies the same correction to the slope channels at build time:
# wherever any ONE-CELL height jump exceeds this grade, the surface is a
# riser and its contact normal snaps to vertical (the tread). Without it, a
# stair riser presents as a central-difference slope of step/(2*scale)
# (level 5: 40 deg, level 7: 47 deg) and every ascent contact fights a
# tilted friction cone — measured as the stairs_up terrain level pinning at
# ~3 while stairs_down reached 6.7 (STATUS r5).
RISER_SLOPE_THRESHOLD = 0.75


_LANE = 128     # TPU lane count: minor-dim DMA offsets must be 128-aligned
_SUB = 8        # f32 sublane tiling: dim-1 DMA offsets must be 8-aligned
_WIN_X = 2 * _LANE       # aligned DMA window (covers any 32-window whose
_WIN_Y = PATCH + _SUB    # clamped aligned start precedes it; see kernel)


def _pad_to(n, m):
    return ((n + m - 1) // m) * m


def build_channels(height_m: np.ndarray, horizontal_scale: float) -> np.ndarray:
    """(R, C) heights -> channel-major (3, C', R') [hmin, dx, dy] grid.

    C' is padded to a multiple of 8 (and >= _WIN_Y), R' to a multiple of 128
    (>= _WIN_X), edge-replicated, so the Pallas extraction can always DMA a
    tile-ALIGNED (_WIN_Y, _WIN_X) window (Mosaic requires sublane/lane-
    divisible HBM memref slices) that contains the exact PATCH window."""
    h = np.asarray(height_m, np.float32)
    hx = np.roll(h, -1, axis=0)
    hx[-1] = h[-1]
    hy = np.roll(h, -1, axis=1)
    hy[:, -1] = h[:, -1]
    hmin = np.minimum(np.minimum(h, hx), hy)
    # slopes: CENTERED differences of hmin (exactly what the direct path's
    # _terrain_normal_t computes from +-1-cell min-of-3 queries) — forward
    # differences of raw h gave near-horizontal normals one cell away from
    # stair edges, diverging from the direct path by up to 40 deg at contacts
    pad = np.pad(hmin, 1, mode="edge")
    dx = (pad[2:, 1:-1] - pad[:-2, 1:-1]) / (2 * horizontal_scale)
    dy = (pad[1:-1, 2:] - pad[1:-1, :-2]) / (2 * horizontal_scale)
    # riser snap (see RISER_SLOPE_THRESHOLD): detection must use ONE-CELL
    # jumps — the centered difference halves a single-cell riser's grade
    # (level-3 stairs: 0.119 m/0.2 m = 0.6 < 0.75) and would miss it
    ddx = np.abs(np.diff(pad, axis=0)) / horizontal_scale    # (R+1, C+2)
    ddy = np.abs(np.diff(pad, axis=1)) / horizontal_scale    # (R+2, C+1)
    riser = ((np.maximum(ddx[:-1, 1:-1], ddx[1:, 1:-1])
              > RISER_SLOPE_THRESHOLD)
             | (np.maximum(ddy[1:-1, :-1], ddy[1:-1, 1:])
                > RISER_SLOPE_THRESHOLD))
    dx = np.where(riser, 0.0, dx).astype(np.float32)
    dy = np.where(riser, 0.0, dy).astype(np.float32)
    # (3, C, R): x (rows of the heightfield) minor — matches the layout XLA
    # picks for the fast windowed-slice lowering, so no in-context relayout
    ch = np.ascontiguousarray(np.stack([hmin, dx, dy], axis=0)
                              .transpose(0, 2, 1))
    C, R = ch.shape[1:]
    Cp = _pad_to(max(C, _WIN_Y), _SUB)
    Rp = _pad_to(max(R, _WIN_X), _LANE)
    if (Cp, Rp) == (C, R):
        return ch
    out = np.zeros((3, Cp, Rp), np.float32)
    out[:, :C, :R] = ch
    out[:, C:, :R] = ch[:, -1:, :]          # edge-replicate
    out[:, :, R:] = out[:, :, R - 1:R]
    return out


def compute_origins(base_ix, base_iy, R, C):
    """Clamped patch-corner cells. base_ix/iy: (N,) int32 -> (N, 2)."""
    ox = jnp.clip(base_ix - PATCH // 2, 0, R - PATCH)
    oy = jnp.clip(base_iy - PATCH // 2, 0, C - PATCH)
    return jnp.stack([ox, oy], axis=1)


def extract_patches_xla(channels: jax.Array, origins: jax.Array) -> jax.Array:
    """XLA fallback: vmap(dynamic_slice). CAUTION: in-context on TPU, XLA
    lowers this to a serialized while-loop of dynamic-update-slices — profiled
    at 8.6 ms/step at N=4096 (43% of the whole physics step). The Pallas DMA
    kernel below is the production path; this remains for CPU tests and as a
    GO2_NO_PALLAS=1 escape hatch."""
    N = origins.shape[0]

    def one(o):
        # channels is (3, C, R): slice (y, x) windows
        return jax.lax.dynamic_slice(channels, (0, o[1], o[0]),
                                     (3, PATCH, PATCH))
    return jax.vmap(one)(origins).reshape(N, 3, PATCH * PATCH)


_ENVS_PER_PROGRAM = 32


def _extract_kernel(ox_ref, oy_ref, ch_ref, out_ref, scratch, sems):
    """One program copies _ENVS_PER_PROGRAM patch windows HBM -> VMEM.

    Mosaic only allows tile-ALIGNED dynamic slices of HBM memrefs (sublane
    offsets % 8, lane offsets % 128), so each env DMAs an aligned
    (3, _WIN_Y, _WIN_X) superset window into scratch, then compacts to the
    exact (3, PATCH, PATCH) with a dynamic sublane slice + lane roll. All B
    copies are started before any wait so the DMA engine pipelines them."""
    import jax.experimental.pallas as pl  # noqa: PLC0415
    from jax.experimental.pallas import tpu as pltpu  # noqa: PLC0415

    b = pl.program_id(0)
    B = out_ref.shape[0]
    Cp = ch_ref.shape[1]
    Rp = ch_ref.shape[2]

    def aligned(i):
        n = b * B + i
        oy8 = jnp.minimum((oy_ref[n] // _SUB) * _SUB, Cp - _WIN_Y)
        ox128 = jnp.minimum((ox_ref[n] // _LANE) * _LANE, Rp - _WIN_X)
        # Cp - _WIN_Y and Rp - _WIN_X are themselves aligned (build_channels
        # pads), so min() preserves divisibility — assert it to Mosaic:
        return pl.multiple_of(oy8, _SUB), pl.multiple_of(ox128, _LANE)

    def dma(i):
        oy8, ox128 = aligned(i)
        return pltpu.make_async_copy(
            ch_ref.at[:, pl.ds(oy8, _WIN_Y), pl.ds(ox128, _WIN_X)],
            scratch.at[i], sems.at[i])

    for i in range(B):
        dma(i).start()
    for i in range(B):
        dma(i).wait()
        n = b * B + i
        oy8, ox128 = aligned(i)
        dy = oy_ref[n] - oy8                 # in [0, _SUB]
        dx = ox_ref[n] - ox128               # in [0, _WIN_X - PATCH]
        # dynamic VMEM slices must also be tile-aligned — compact with
        # modular rolls (tpu.dynamic_rotate) + static slices instead
        win = scratch[i]                                  # (3, _WIN_Y, _WIN_X)
        win = pltpu.roll(win, _WIN_Y - dy, axis=1)
        win = pltpu.roll(win, _WIN_X - dx, axis=2)
        out_ref[i] = win[:, :PATCH, :PATCH]


def extract_patches_pallas(channels: jax.Array, origins: jax.Array,
                           interpret: bool = False) -> jax.Array:
    """(3, C', R'), (N, 2) -> (N, 3, PATCH, PATCH) via per-env DMA windows.

    Each env's patch is ONE strided DMA descriptor (3 x _WIN_Y rows of
    _WIN_X*4 contiguous bytes) issued straight from scalar-prefetched
    origins — no gather HLO, no serialized while-loop (the XLA lowering of
    vmap(dynamic_slice) profiled at 8.6 ms/step at N=4096; see
    extract_patches_xla)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = origins.shape[0]
    B = _ENVS_PER_PROGRAM
    n_pad = (-N) % B
    ox = origins[:, 0].astype(jnp.int32)
    oy = origins[:, 1].astype(jnp.int32)
    if n_pad:
        ox = jnp.concatenate([ox, jnp.zeros((n_pad,), jnp.int32)])
        oy = jnp.concatenate([oy, jnp.zeros((n_pad,), jnp.int32)])

    out = pl.pallas_call(
        _extract_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=((N + n_pad) // B,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (B, 3, PATCH, PATCH), lambda b, ox, oy: (b, 0, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((B, 3, _WIN_Y, _WIN_X), channels.dtype),
                pltpu.SemaphoreType.DMA((B,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((N + n_pad, 3, PATCH, PATCH),
                                       channels.dtype),
        interpret=interpret,
    )(ox, oy, channels)
    return out[:N]


def _use_pallas() -> bool:
    if os.environ.get("GO2_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def extract_patches(channels: jax.Array, origins: jax.Array) -> jax.Array:
    """(3, C, R), (N, 2) -> (N, 3, PATCH*PATCH) patch windows.

    Pallas DMA path on accelerators (profiled 8.6 ms -> sub-ms at N=4096 on
    v5e); XLA vmap(dynamic_slice) on CPU / with GO2_NO_PALLAS=1."""
    N = origins.shape[0]
    if _use_pallas():
        return extract_patches_pallas(channels, origins).reshape(
            N, 3, PATCH * PATCH)
    return extract_patches_xla(channels, origins)


def lookup(patches: jax.Array, origins: jax.Array, ix: jax.Array,
           iy: jax.Array):
    """In-patch query: (N, 3, PATCH*PATCH) x (N, P) cells -> 3 x (N, P).

    ix/iy are absolute grid cells; clamped into the patch window. Returns
    (hmin, dx, dy) each (N, P)."""
    lx = jnp.clip(ix - origins[:, 0:1], 0, PATCH - 1)
    ly = jnp.clip(iy - origins[:, 1:2], 0, PATCH - 1)
    lin = ly * PATCH + lx                  # patches are (y, x) windows

    onehot = jax.nn.one_hot(lin, PATCH * PATCH, dtype=jnp.float32)
    # Per-operand precision: the one-hot is EXACT in one bf16 pass (0/1), but
    # the height data must not be truncated to bf16 (mm-cm error vs the 1e-4 m
    # contact-gap threshold) -> HIGHEST (3-chunk decomposition) on the data
    # operand only. 3 MXU passes instead of HIGHEST/HIGHEST's 6 — profiled
    # 3.0 -> ~1.5 ms/step at N=4096, P=78, 4 substeps.
    vals = jnp.einsum("npc,nkc->nkp", onehot, patches,
                      precision=(jax.lax.Precision.DEFAULT,
                                 jax.lax.Precision.HIGHEST))   # (N, 3, P)
    return vals[:, 0], vals[:, 1], vals[:, 2]
