"""Multi-device / multi-host data-parallel sharding.

The reference has no working multi-device path (the `--horovod` flag at
reference helpers.py:138 is dead, SURVEY.md §2.5/§2.6). Here the whole fused
train step runs under a `jax.sharding.Mesh` with the env batch sharded over a
`data` axis and parameters replicated; XLA inserts the collectives (psum on
gradients, global mean/std for the advantage normalization at
rollout_storage.py:136-137) over ICI/DCN automatically.

Sharding is decided by PYTREE PATH, not shape: every leaf is env-batched
(sharded on dim 0 over `data`) except the explicitly-replicated state —
network/optimizer train state, RNG keys, and the few global env scalars
(cmd_range_x, common_step_counter). A shape-coincidence rule (dim0 ==
num_envs) would silently misshard e.g. a (4096, ...) parameter matrix.

Multi-process (multi-host) usage: initialize `jax.distributed`, build the
global mesh over ALL processes' devices, and construct the RunnerState
*through a jitted init with out_shardings on that mesh* — each process then
materializes only its addressable shards (never the full array), which is
what makes >HBM-per-host env counts possible. train/runner.py's
`init_runner_state(..., mesh=...)` does exactly this.

RNG note: the carried key is replicated; JAX's partitionable threefry makes
`jax.random.*(key, (N, ...))` produce one logical array sharded over devices,
so per-env randomness stays correct without per-host key plumbing.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# RunnerState fields replicated across the mesh (everything else is
# env-batched). env_state sub-leaves that are global rather than per-env:
_REPLICATED_FIELDS = frozenset({
    "train_state",            # params + both optimizer states + adaptive LR
    "key",                    # runner RNG key (partitionable threefry)
    "cmd_range_x",            # global command-range curriculum (2,)
    "common_step_counter",    # () int32
    "iteration",              # () counters, if present
})


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _is_replicated(path) -> bool:
    for entry in path:
        name = getattr(entry, "name", None) or getattr(entry, "key", None)
        if name in _REPLICATED_FIELDS:
            return True
    return False


def runner_shardings(mesh: Mesh, tree, axis: str = "data"):
    """Sharding pytree for a RunnerState(-shaped) tree by pytree path."""
    repl = NamedSharding(mesh, P())

    def one(path, leaf):
        if _is_replicated(path):
            return repl
        ndim = len(getattr(leaf, "shape", ()))
        if ndim == 0:
            return repl
        return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))

    return jax.tree_util.tree_map_with_path(one, tree)


def shard_runner_state(mesh: Mesh, rs, num_envs: int = 0, axis: str = "data"):
    """Device-put an already-materialized RunnerState onto the mesh.

    (Single-process path; multi-process initialization should instead build
    the state sharded via init_runner_state(..., mesh=...).)"""
    sh = runner_shardings(mesh, rs, axis)
    return jax.tree.map(jax.device_put, rs, sh)


# Back-compat alias used by older tools; path-based now.
def batch_shardings(mesh: Mesh, tree, batch_size: int = 0, axis: str = "data"):
    return runner_shardings(mesh, tree, axis)


def make_sharded_train_step(runner, mesh: Mesh, rs_example, axis: str = "data"):
    """jit the runner's train step with explicit in/out shardings."""
    in_sh = runner_shardings(mesh, rs_example, axis)
    fn = runner._build_train_step()
    return jax.jit(fn, in_shardings=(in_sh,))


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None):
    """jax.distributed bring-up (TPU pods auto-detect; explicit args for
    CPU/test clusters). Safe to call once per process before any jax op."""
    kwargs = {}
    if coordinator:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
