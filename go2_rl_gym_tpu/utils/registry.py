"""Task registry: name -> (env cfg, train cfg) factories.

Counterpart of reference legged_gym/utils/task_registry.py:15-129 +
legged_gym/envs/__init__.py:9-15 (the same seven registered tasks), without
the reference's string-`eval()` class dispatch — algorithms are selected by
validated names.
"""
from __future__ import annotations

import os
from datetime import datetime
from typing import Callable, Dict, Optional, Tuple

from go2_rl_gym_tpu.env import config as cfgs
from go2_rl_gym_tpu.env.go2_env import Go2Env
from go2_rl_gym_tpu.train.runner import OnPolicyRunner

_REGISTRY: Dict[str, Tuple[Callable, Callable]] = {}


def register(name: str, env_cfg_fn: Callable, train_cfg_fn: Callable):
    _REGISTRY[name] = (env_cfg_fn, train_cfg_fn)


def task_names():
    return sorted(_REGISTRY)


def get_cfgs(name: str):
    if name not in _REGISTRY:
        raise KeyError(f"unknown task {name!r}; available: {task_names()}")
    env_cfg_fn, train_cfg_fn = _REGISTRY[name]
    return env_cfg_fn(), train_cfg_fn()


def make_env(name: str, env_cfg=None, num_envs: Optional[int] = None,
             num_steps_per_env: int = 24, terrain_seed: int = 0) -> Go2Env:
    if env_cfg is None:
        env_cfg, _ = get_cfgs(name)
    if num_envs is not None:
        env_cfg.env.num_envs = num_envs
    return Go2Env(env_cfg, num_steps_per_env=num_steps_per_env,
                  terrain_seed=terrain_seed)


def make_runner(name: str, env: Go2Env, train_cfg=None,
                log_root: Optional[str] = None,
                run_name: str = "") -> OnPolicyRunner:
    if train_cfg is None:
        _, train_cfg = get_cfgs(name)
    log_dir = None
    if log_root is not None:
        stamp = datetime.now().strftime("%b%d_%H-%M-%S")
        log_dir = os.path.join(
            log_root, train_cfg.runner.experiment_name,
            stamp + ("_" + run_name if run_name else ""))
    return OnPolicyRunner(env, train_cfg, log_dir=log_dir)


# ---- the seven reference tasks (legged_gym/envs/__init__.py:9-15) ----
register("go2", cfgs.Go2Cfg, cfgs.go2_ppo_train_cfg)
register("go2_cts", cfgs.Go2Cfg, cfgs.go2_cts_train_cfg)
register("go2_moe_cts", cfgs.Go2Cfg, cfgs.go2_moe_cts_train_cfg)
register("go2_moe_ng_cts", cfgs.Go2Cfg, cfgs.go2_moe_ng_cts_train_cfg)
register("go2_mcp_cts", cfgs.Go2Cfg, cfgs.go2_mcp_cts_train_cfg)
register("go2_ac_moe_cts", cfgs.Go2Cfg, cfgs.go2_ac_moe_cts_train_cfg)
register("go2_dual_moe_cts", cfgs.Go2Cfg, cfgs.go2_dual_moe_cts_train_cfg)
# recurrent PPO (the reference ships the module but registers no task)
register("go2_lstm", cfgs.Go2Cfg, cfgs.go2_lstm_train_cfg)

# ---- ablation variant tasks (reference go2_config_{vanilla,...}.py) ----
from go2_rl_gym_tpu.env import config_variants as _variants  # noqa: E402

register("go2_vanilla", _variants.go2_vanilla_cfg,
         _variants.go2_vanilla_train_cfg)
register("go2_vanilla_dynamic_cmd", _variants.go2_vanilla_dynamic_cmd_cfg,
         _variants.go2_vanilla_train_cfg)
register("go2_fast_flat_move", _variants.go2_fast_flat_move_cfg,
         _variants.go2_fast_flat_move_train_cfg)
