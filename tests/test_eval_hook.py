"""Async in-training evaluator (RoboGauge counterpart): end-to-end round trip
— export policy, submit to the subprocess evaluator, poll the score dict."""
import os
import time

import jax
import jax.numpy as jnp
import pytest

from go2_rl_gym_tpu.agents.networks import make_cts_model
from go2_rl_gym_tpu.env.config import PolicyCfg
from go2_rl_gym_tpu.export import exporter
from go2_rl_gym_tpu.train.eval_hook import AsyncEvaluator

NO_GOAL = tuple([True] * 6 + [False] * 3 + [True] * 36)


def test_async_evaluator_roundtrip(tmp_path):
    pytest.importorskip("torch")
    pytest.importorskip("mujoco")
    pc = PolicyCfg(obs_no_goal_mask=NO_GOAL)
    model = make_cts_model("cts", 45, 263, 12, pc, 5)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 45)),
                        jnp.zeros((1, 263)), jnp.zeros((1, 225)))
    path = exporter.export_policy_as_jit(params, "cts", str(tmp_path),
                                         obs_no_goal_mask=NO_GOAL)
    ev = AsyncEvaluator(str(tmp_path), scenes=("flat",), duration_s=1.0)
    ev.submit(path, iteration=7)
    results = ev.wait_all(timeout=300)
    assert 7 in results, "evaluation subprocess produced no result"
    scores = results[7]
    for k in ("tracking", "safety", "quality", "overall"):
        assert k in scores and 0.0 <= float(scores[k]) <= 1.0
    assert os.path.exists(os.path.join(str(tmp_path), "eval_results",
                                       "results_7.yaml"))
