"""Terrain generator tests: grid layout, origins, primitive semantics."""
import numpy as np
import pytest

from go2_rl_gym_tpu.terrain import generator


class TCfg:
    mesh_type = "heightfield"
    horizontal_scale = 0.1
    vertical_scale = 0.005
    border_size = 5.0
    curriculum = True
    terrain_length = 8.0
    terrain_width = 8.0
    num_rows = 4
    num_cols = 9
    terrain_spacing = 0.5
    terrain_proportions = [0.05, 0.20, 0.05, 0.25, 0.10, 0.20, 0.0, 0.0, 0.15]


def test_grid_dimensions():
    g = generator.build_terrain(TCfg(), seed=0)
    border = int(5.0 / 0.1)
    lpx = int(8.0 / 0.1)
    sp = int(0.5 / 0.1)
    assert g.height_field.shape == (4 * lpx + 3 * sp + 2 * border,
                                    9 * lpx + 8 * sp + 2 * border)
    assert g.height_field.dtype == np.int16
    assert g.env_origins.shape == (4, 9, 3)


def test_curriculum_types_cover_proportions():
    g = generator.build_terrain(TCfg(), seed=0)
    # with these proportions: cols 0 slope.., expect flat in last ~15% cols
    names = set(g.name2cols.keys())
    assert "flat" in names and ("stairs_up" in names or "stairs_down" in names)
    # all columns mapped
    allcols = sorted(c for cols in g.name2cols.values() for c in cols)
    assert allcols == list(range(9))
    assert g.cols2id.shape == (9,)


def test_flat_subterrain_is_flat():
    g = generator.build_terrain(TCfg(), seed=0)
    flat_cols = g.name2cols["flat"]
    j = flat_cols[0]
    border = 50
    lpx, sp = 80, 5
    sx = border + 0 * (lpx + sp)
    sy = border + j * (lpx + sp)
    patch = g.height_field[sx:sx + lpx, sy:sy + lpx]
    assert np.all(patch == 0)


def test_origins_inside_grid():
    g = generator.build_terrain(TCfg(), seed=0)
    assert np.all(g.env_origins[..., 0] > 0)
    assert np.all(g.env_origins[..., 0] < 4 * 8.5)
    assert np.all(np.abs(g.env_origins[..., 2]) < 3.0)


def test_difficulty_scaling_monotone():
    """Higher rows (difficulty) produce larger height ranges for stairs."""
    g = generator.build_terrain(TCfg(), seed=0)
    stairs_cols = g.name2cols.get("stairs_up", []) + g.name2cols.get("stairs_down", [])
    assert stairs_cols
    j = stairs_cols[0]
    border, lpx, sp = 50, 80, 5
    ranges = []
    for i in range(4):
        sx = border + i * (lpx + sp)
        sy = border + j * (lpx + sp)
        patch = g.height_field[sx:sx + lpx, sy:sy + lpx]
        ranges.append(patch.max() - patch.min())
    assert ranges[-1] > ranges[0]


def test_pyramid_stairs_step_height():
    hf = np.zeros((80, 80), np.int16)
    generator.pyramid_stairs(hf, 0.1, 0.005, step_width=0.31, step_height=0.1,
                             platform_size=3.0)
    levels = np.unique(hf)
    # 0.1 m / 0.005 = 20 units per step
    assert 20 in np.diff(levels)


def test_wave_amplitude():
    hf = np.zeros((80, 80), np.int16)
    generator.wave(hf, 0.1, 0.005, num_waves=5, amplitude=0.2)
    # amp = 0.5*0.2/0.005 = 20 units; cos+sin superposition -> p2p in [20, 80]
    assert 20 <= hf.max() - hf.min() <= 80


def test_gap_depth():
    hf = np.zeros((80, 80), np.int16)
    generator.gap(hf, 0.1, 0.005, gap_size=0.8, platform_size=3.0)
    assert hf.min() == -1000
    assert hf[40, 40] == 0  # center platform


def test_random_uniform_bounds():
    hf = np.zeros((80, 80), np.int16)
    rng = np.random.default_rng(0)
    generator.random_uniform(hf, rng, 0.1, 0.005, -0.05, 0.05, 0.005, 0.2)
    assert hf.min() >= -11 and hf.max() <= 11  # +-0.05/0.005 = +-10 (+1 interp slack)
    assert hf.std() > 0


def test_randomized_mode_maps_empty():
    """Reference semantics (terrain.py:34, 51-70): column-level type maps are
    only well defined under curriculum (type is a function of the column);
    in randomized mode each CELL draws its own type, so name2cols/cols2id
    must stay EMPTY and downstream per-terrain caps/logging disable
    (legged_robot.py:863-870, 1074-1075) — not silently mislabel columns
    with the last row's draw."""
    cfg = TCfg()
    cfg.curriculum = False
    g = generator.build_terrain(cfg, seed=0)
    assert g.name2cols == {}
    assert g.cols2id.shape == (0,)


def test_randomized_mode_env_uncapped():
    """With empty cols2id the env applies NO per-terrain command caps."""
    import jax.numpy as jnp
    from go2_rl_gym_tpu.env.config import Go2Cfg
    from go2_rl_gym_tpu.env.go2_env import Go2Env
    cfg = Go2Cfg()
    cfg.env.num_envs = 4
    cfg.terrain.curriculum = False
    cfg.terrain.num_rows = 2
    cfg.terrain.num_cols = 2
    env = Go2Env(cfg, num_steps_per_env=4)
    assert env.cols2id is None
    assert env.terrain_type_names == {}
    ranges = jnp.asarray([[-1.0, 1.0]] * 4)
    out = env._env_command_ranges(ranges, jnp.zeros(4, jnp.int32))
    np.testing.assert_array_equal(np.asarray(out),
                                  np.broadcast_to(np.asarray(ranges), (4, 4, 2)))


def test_reproducible():
    g1 = generator.build_terrain(TCfg(), seed=7)
    g2 = generator.build_terrain(TCfg(), seed=7)
    np.testing.assert_array_equal(g1.height_field, g2.height_field)
