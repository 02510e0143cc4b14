"""Runner-level tests: checkpoint round-trip, learn-loop smoke, CTS minibatch
layout invariant after the pre-permute refactor."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go2_rl_gym_tpu.agents import cts as cts_lib
from go2_rl_gym_tpu.env.config import (AlgorithmCfg, Go2Cfg, PolicyCfg,
                                       go2_cts_train_cfg, go2_ppo_train_cfg)
from go2_rl_gym_tpu.env.go2_env import Go2Env
from go2_rl_gym_tpu.train.runner import OnPolicyRunner


def tiny_env(num_envs=8):
    cfg = Go2Cfg()
    cfg.env.num_envs = num_envs
    cfg.terrain.mesh_type = "plane"
    cfg.terrain.measure_heights = False
    cfg.terrain.curriculum = False
    return Go2Env(cfg, num_steps_per_env=4)


def test_checkpoint_roundtrip(tmp_path):
    tc = go2_ppo_train_cfg()
    tc.runner.num_steps_per_env = 4
    env = tiny_env()
    runner = OnPolicyRunner(env, tc, log_dir=None)
    rs = runner.init_runner_state(jax.random.PRNGKey(0))
    rs, _ = runner._train_step(rs)
    runner.current_iteration = 17
    path = os.path.join(str(tmp_path), "model_17")
    runner.save(rs, path)

    runner2 = OnPolicyRunner(env, tc, log_dir=None)
    rs2 = runner2.init_runner_state(jax.random.PRNGKey(99))
    rs2 = runner2.load(rs2, path)
    assert runner2.current_iteration == 17
    # full pytree restored: params AND env state (exact resume)
    p1 = jax.tree.leaves(rs.train_state.params)
    p2 = jax.tree.leaves(rs2.train_state.params)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(rs.env_state.episode_length),
                                  np.asarray(rs2.env_state.episode_length))
    np.testing.assert_array_equal(np.asarray(rs.env_state.key),
                                  np.asarray(rs2.env_state.key))
    # resumed training continues identically
    ra, _ = runner._train_step(rs)
    rb, _ = runner2._train_step(rs2)
    np.testing.assert_allclose(np.asarray(jax.tree.leaves(ra.train_state.params)[0]),
                               np.asarray(jax.tree.leaves(rb.train_state.params)[0]),
                               atol=1e-6)


def test_learn_loop_smoke(tmp_path):
    tc = go2_cts_train_cfg()
    tc.runner.num_steps_per_env = 4
    tc.runner.save_interval = 2
    env = tiny_env()
    runner = OnPolicyRunner(env, tc, log_dir=str(tmp_path))
    rs = runner.init_runner_state(jax.random.PRNGKey(0))
    rs = runner.learn(rs, 5, log_every=2, print_every=10)
    assert os.path.exists(os.path.join(str(tmp_path), "metrics.jsonl"))
    assert os.path.exists(os.path.join(str(tmp_path), "config.yaml"))
    assert any(d.startswith("model_") for d in os.listdir(str(tmp_path)))
    # async-drain cadence: metrics land for exactly the iterations the
    # pre-async runner logged (it % log_every == 0, plus the final it)
    import json
    steps = sorted({json.loads(l)["step"]
                    for l in open(os.path.join(str(tmp_path),
                                               "metrics.jsonl"))})
    assert steps == [0, 2, 4], steps
    # checkpoints at save_interval multiples plus the final model
    saves = sorted(int(d.split("_")[1]) for d in os.listdir(str(tmp_path))
                   if d.startswith("model_"))
    assert saves == [0, 2, 4, 5], saves


@pytest.mark.parametrize("make_cfg", [go2_ppo_train_cfg, go2_cts_train_cfg])
def test_train_step_cache_stable(make_cfg):
    """Two chained train steps must NOT retrace: a weak-typed leaf (e.g. the
    std param, or the adaptive lr scalar) changes its abstract signature after
    one optimizer step and silently doubles compile cost (VERDICT r2 weak#1)."""
    tc = make_cfg()
    tc.runner.num_steps_per_env = 4
    env = tiny_env()
    runner = OnPolicyRunner(env, tc, log_dir=None)
    rs = runner.init_runner_state(jax.random.PRNGKey(0))
    rs, _ = runner._train_step(rs)
    rs, _ = runner._train_step(rs)
    jax.block_until_ready(rs.train_state)
    assert runner._train_step._cache_size() == 1, (
        "fused train step recompiled between chained calls — a RunnerState "
        "leaf changed dtype/weak_type after the first optimizer step")


def test_cts_minibatch_teacher_first_layout():
    """After pre-permute, every minibatch slot must contain exactly tmb
    teacher samples then smb student samples (the invariant the update's
    surrogate split relies on, reference rollout_storage_cts.py:194-216)."""
    N, T = 8, 4
    alg = cts_lib.CTS("CTS", 45, 263, 12, N, 5, PolicyCfg(
        actor_hidden_dims=(16,), critic_hidden_dims=(16,),
        teacher_encoder_hidden_dims=(16,), student_encoder_hidden_dims=(16,)),
        AlgorithmCfg(num_mini_batches=2, num_learning_epochs=1))
    # tag each sample with its env id in obs[...,0]
    env_ids = jnp.broadcast_to(jnp.arange(N)[None, :, None], (T, N, 1))
    obs = jnp.concatenate([env_ids.astype(jnp.float32),
                           jnp.zeros((T, N, 44))], axis=-1)
    flat = jnp.swapaxes(obs, 0, 1).reshape(N * T, 45)
    t_pos, s_pos = alg._flat_indices(T)
    teacher_ids = set(np.asarray(flat[t_pos][:, 0], np.int32))
    student_ids = set(np.asarray(flat[s_pos][:, 0], np.int32))
    assert teacher_ids == set(alg.teacher_envs.tolist())
    assert student_ids == set(alg.student_envs.tolist())


def test_load_params_across_env_counts(tmp_path):
    """A training checkpoint saved at one env count must load params-only
    into a session with a different env count (play/eval path, reference
    play.py:38-40)."""
    from go2_rl_gym_tpu.env.config import Go2Cfg, go2_cts_train_cfg
    from go2_rl_gym_tpu.env.go2_env import Go2Env
    from go2_rl_gym_tpu.train.runner import OnPolicyRunner

    def make(n):
        cfg = Go2Cfg()
        cfg.env.num_envs = n
        cfg.terrain.mesh_type = "plane"
        cfg.terrain.measure_heights = False
        cfg.terrain.curriculum = False
        tc = go2_cts_train_cfg()
        tc.runner.num_steps_per_env = 2
        env = Go2Env(cfg, num_steps_per_env=2)
        return OnPolicyRunner(env, tc, log_dir=None)

    r16 = make(16)
    rs = r16.init_runner_state(jax.random.PRNGKey(0))
    path = str(tmp_path / "ck")
    r16.save(rs, path)

    r8 = make(8)
    params = r8.load_params(path)
    want = r16.get_inference_params(rs)
    got_leaves = {jax.tree_util.keystr(p): v
                  for p, v in jax.tree_util.tree_leaves_with_path(params)}
    for p, v in jax.tree_util.tree_leaves_with_path(want):
        np.testing.assert_allclose(got_leaves[jax.tree_util.keystr(p)],
                                   np.asarray(v), atol=0,
                                   err_msg=jax.tree_util.keystr(p))


def test_learn_chunk_alignment_unaligned_start(tmp_path):
    """Chunked dispatch must keep EXACT save cadence/naming when the start
    iteration is not aligned to save_interval (the resume-after-watchdog
    case: e.g. resume at 50001 with saves every 500). Chunks are sized to
    END at each boundary, so model_<N> always holds the params after
    completing step N (runner._next_boundary)."""
    tc = go2_ppo_train_cfg()
    tc.runner.num_steps_per_env = 4
    tc.runner.save_interval = 4
    env = tiny_env()
    runner = OnPolicyRunner(env, tc, log_dir=str(tmp_path))
    rs = runner.init_runner_state(jax.random.PRNGKey(0))
    runner.current_iteration = 3          # unaligned resume point
    runner.learn(rs, 7, log_every=4, print_every=100)
    # iterations 3..9 run; save boundaries hit at 4 and 8; final at 10
    saves = sorted(int(d.split("_")[1]) for d in os.listdir(str(tmp_path))
                   if d.startswith("model_"))
    assert saves == [4, 8, 10], saves
