"""C++ inference shim: build, load, and match the JAX forward."""
import shutil

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from go2_rl_gym_tpu.agents.networks import make_cts_model
from go2_rl_gym_tpu.env.config import PolicyCfg
from go2_rl_gym_tpu.export import native

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


def _jax_forward_seq(model, params, obs_seq):
    hist = jnp.zeros((1, 5, 45))
    outs = []
    for obs in obs_seq:
        obs = obs[None]
        hist = jnp.concatenate([hist[:, 1:], obs[:, None]], axis=1)
        lat, _ = model.apply(params, hist.reshape(1, -1), method="s_latent")
        mu, _, _ = model.apply(params, lat, obs, method="dist")
        outs.append(np.asarray(mu)[0])
    return np.stack(outs)


@pytest.mark.parametrize("family", ["cts", "moe_cts"])
def test_native_matches_jax(family, tmp_path):
    dims = (512, 256, 256) if family == "moe_cts" else (512, 256)
    pc = PolicyCfg(student_encoder_hidden_dims=dims)
    model = make_cts_model(family, 45, 263, 12, pc, 5)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 45)),
                        jnp.zeros((1, 263)), jnp.zeros((1, 225)))
    path = native.export_policy_as_native(params, family, str(tmp_path))
    policy = native.NativePolicy(path)
    assert policy.num_obs == 45 and policy.num_actions == 12

    obs_seq = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (6, 45)),
                         np.float32)
    want = _jax_forward_seq(model, params, jnp.asarray(obs_seq))
    got = np.stack([policy(o) for o in obs_seq])
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)

    # reset clears the history ring
    policy.reset()
    first_again = policy(obs_seq[0])
    np.testing.assert_allclose(first_again, want[0], atol=3e-5, rtol=1e-4)


def test_native_rejects_garbage(tmp_path):
    bad = tmp_path / "bad.g2p"
    bad.write_bytes(b"not a policy")
    with pytest.raises(RuntimeError):
        native.NativePolicy(str(bad))


@pytest.mark.parametrize("family", ["cts", "moe_cts", "moe_ng_cts",
                                    "mcp_cts", "ac_moe_cts", "dual_moe_cts"])
def test_native_onnx_runtime_matches_python(family, tmp_path):
    """The C++ shim's bundled ONNX executor (native/go2_infer/
    onnx_runtime.cpp) must load the framework's native ONNX artifacts and
    match the Python interpreter + the JAX forward for every family."""
    from go2_rl_gym_tpu.export import exporter, onnx_native
    NO_GOAL = tuple([True] * 6 + [False] * 3 + [True] * 36)
    dims = ((512, 256, 256) if family in ("moe_cts", "dual_moe_cts")
            else (512, 256))
    pc = PolicyCfg(obs_no_goal_mask=NO_GOAL, student_encoder_hidden_dims=dims)
    model = make_cts_model(family, 45, 263, 12, pc, 5)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 45)),
                        jnp.zeros((1, 263)), jnp.zeros((1, 225)))
    path = exporter.export_policy_as_onnx(params, family, str(tmp_path),
                                          obs_no_goal_mask=NO_GOAL)
    policy = native.NativePolicy(path)
    assert policy.num_obs == 45 and policy.num_actions == 12

    obs_seq = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (6, 45)),
                         np.float32)
    got = np.stack([policy(o) for o in obs_seq])

    # python reference: same frames through the stateless graph per step
    pol_py = onnx_native.OnnxPolicy(path)
    frames = np.zeros((5, 45), np.float32)
    dims6 = (3, 3, 3, 12, 12, 12)
    off = np.cumsum((0,) + dims6)
    want = []
    for o in obs_seq:
        frames = np.concatenate([frames[1:], o[None]], 0)
        x = np.concatenate([frames[None, :, off[t]:off[t + 1]].reshape(1, -1)
                            for t in range(6)], axis=1)
        out = pol_py(x)
        want.append((out[0] if isinstance(out, tuple) else out)[0])
    np.testing.assert_allclose(got, np.stack(want), atol=1e-5, rtol=1e-4)
