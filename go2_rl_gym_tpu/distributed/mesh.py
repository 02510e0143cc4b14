"""Multi-device data-parallel sharding.

The reference has no working multi-device path (the `--horovod` flag at
reference helpers.py:138 is dead, SURVEY.md §2.5/§2.6). Here the whole fused
train step runs under a `jax.sharding.Mesh` with the env batch sharded over a
`data` axis and parameters replicated; XLA inserts the collectives (psum on
gradients, global mean/std for the advantage normalization at
rollout_storage.py:136-137) over ICI/DCN automatically.

RNG note: the carried key is replicated; JAX's partitionable threefry makes
`jax.random.*(key, (N, ...))` produce one logical array sharded over devices,
so per-env randomness stays correct without per-host key plumbing.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def batch_shardings(mesh: Mesh, tree, batch_size: int, axis: str = "data"):
    """Sharding pytree: leaves with a leading `batch_size` dim are sharded on
    the data axis, everything else (params, scalars, counters) replicated."""
    def leaf_sharding(leaf):
        shape = jnp.shape(leaf)
        if len(shape) >= 1 and shape[0] == batch_size:
            return NamedSharding(mesh, P(axis, *([None] * (len(shape) - 1))))
        return NamedSharding(mesh, P())
    return jax.tree.map(leaf_sharding, tree)


def shard_runner_state(mesh: Mesh, rs, num_envs: int, axis: str = "data"):
    """Device-put a RunnerState according to batch_shardings."""
    sh = batch_shardings(mesh, rs, num_envs, axis)
    return jax.tree.map(jax.device_put, rs, sh)


def make_sharded_train_step(runner, mesh: Mesh, rs_example, axis: str = "data"):
    """jit the runner's train step with explicit in/out shardings."""
    in_sh = batch_shardings(mesh, rs_example, runner.env.num_envs, axis)
    fn = runner._build_train_step()
    return jax.jit(fn, in_shardings=(in_sh,))
