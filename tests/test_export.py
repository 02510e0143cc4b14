"""Export round-trip tests: TorchScript mirror must match the JAX forward."""
import os
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from go2_rl_gym_tpu.agents.networks import make_cts_model
from go2_rl_gym_tpu.env.config import PolicyCfg
from go2_rl_gym_tpu.export import exporter

NO_GOAL = tuple([True] * 6 + [False] * 3 + [True] * 36)


def _policy_cfg(family):
    dims = (512, 256, 256) if family in ("moe_cts", "dual_moe_cts") else (512, 256)
    return PolicyCfg(obs_no_goal_mask=NO_GOAL, student_encoder_hidden_dims=dims)


def _jax_student_forward(model, params, obs_seq):
    """Run the student inference path with an explicit history buffer, the way
    act_inference does (actor_critic_cts.py:162-167)."""
    hist = jnp.zeros((1, 5, 45))
    outs = []
    for obs in obs_seq:
        obs = obs[None]
        hist = jnp.concatenate([hist[:, 1:], obs[:, None]], axis=1)
        lat, _ = model.apply(params, hist.reshape(1, -1), method="s_latent")
        mu, _, _ = model.apply(params, lat, obs, method="dist")
        outs.append(np.asarray(mu)[0])
    return np.stack(outs)


@pytest.mark.parametrize("family", ["cts", "moe_cts", "moe_ng_cts", "mcp_cts",
                                    "ac_moe_cts", "dual_moe_cts"])
def test_torchscript_matches_jax(family, tmp_path):
    torch = pytest.importorskip("torch")
    pc = _policy_cfg(family)
    model = make_cts_model(family, 45, 263, 12, pc, 5)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 45)),
                        jnp.zeros((1, 263)), jnp.zeros((1, 225)))

    path = exporter.export_policy_as_jit(
        params, family, str(tmp_path), num_obs=45, history_length=5,
        obs_no_goal_mask=NO_GOAL)
    policy = torch.jit.load(path)

    obs_seq = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (7, 45)),
                         np.float32)
    want = _jax_student_forward(model, params, jnp.asarray(obs_seq))

    got = []
    for obs in obs_seq:
        out = policy(torch.from_numpy(obs).unsqueeze(0))
        if isinstance(out, tuple):
            out = out[0]
        got.append(out.detach().numpy()[0])
    got = np.stack(got)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_torchscript_reset(tmp_path):
    torch = pytest.importorskip("torch")
    pc = _policy_cfg("cts")
    model = make_cts_model("cts", 45, 263, 12, pc, 5)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 45)),
                        jnp.zeros((1, 263)), jnp.zeros((1, 225)))
    path = exporter.export_policy_as_jit(params, "cts", str(tmp_path))
    policy = torch.jit.load(path)
    obs = torch.ones(1, 45)
    a1 = policy(obs).clone()
    policy(obs * 2)  # mutate history
    policy.reset()
    a2 = policy(obs)
    np.testing.assert_allclose(a1.detach(), a2.detach(), atol=1e-6)


def test_pkl_roundtrip(tmp_path):
    pc = _policy_cfg("cts")
    model = make_cts_model("cts", 45, 263, 12, pc, 5)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 45)),
                        jnp.zeros((1, 263)), jnp.zeros((1, 225)))
    path = exporter.export_policy_as_pkl(params, {"family": "cts"},
                                         str(tmp_path))
    loaded, meta = exporter.load_policy_params(path)
    assert meta["family"] == "cts"
    chex = pytest.importorskip("chex")
    chex.assert_trees_all_close(
        jax.tree.map(jnp.asarray, loaded), params, atol=0)


@pytest.mark.parametrize("family", ["cts", "moe_cts"])
def test_stacked_by_term_adapter_matches_ring_buffer(family):
    """The ONNX-interface adapter (stacked-BY-TERM history input, reference
    _OnnxPolicyExporter.flatten_obs, exporter.py:238-262) must agree with
    feeding the same frames through the ring-buffer policy in order."""
    torch = pytest.importorskip("torch")
    pc = _policy_cfg(family)
    model = make_cts_model(family, 45, 263, 12, pc, 5)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 45)),
                        jnp.zeros((1, 263)), jnp.zeros((1, 225)))

    ring = exporter.build_torch_policy(params, family, 45, 5, NO_GOAL)
    stacked = exporter.build_torch_policy_stacked(params, family, 45, 5,
                                                  NO_GOAL)
    frames = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (5, 45)),
                        np.float32)
    # build the stacked-by-term input: [term0 over frames | term1 ... ]
    dims = (3, 3, 3, 12, 12, 12)
    chunks, off = [], 0
    for d in dims:
        chunks.append(frames[:, off:off + d].reshape(1, -1))  # (1, 5*d)
        off += d
    x = torch.from_numpy(np.concatenate(chunks, axis=1))

    ring.reset()
    for f in frames:
        want = ring(torch.from_numpy(f).unsqueeze(0))
    got = stacked(x)
    if isinstance(want, tuple):
        want, got = want[0], got[0]
    np.testing.assert_allclose(got.detach().numpy(), want.detach().numpy(),
                               atol=1e-5)


@pytest.mark.parametrize("family", ["cts", "moe_cts", "moe_ng_cts",
                                    "mcp_cts", "ac_moe_cts", "dual_moe_cts"])
def test_onnx_export_matches_torch_mirror(tmp_path, family):
    """The native ONNX artifact (export/onnx_native.py — serialized without
    the onnx wheel, reference exporter.py:195-338 interface) must match the
    TorchScript stacked mirror to 1e-5 when loaded and executed by the
    in-repo ONNX interpreter."""
    torch = pytest.importorskip("torch")
    from go2_rl_gym_tpu.export import onnx_native
    pc = _policy_cfg(family)
    model = make_cts_model(family, 45, 263, 12, pc, 5)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 45)),
                        jnp.zeros((1, 263)), jnp.zeros((1, 225)))
    path = exporter.export_policy_as_onnx(params, family, str(tmp_path),
                                          obs_no_goal_mask=NO_GOAL)
    assert path is not None and os.path.exists(path)
    pol = onnx_native.OnnxPolicy(path)
    stacked = exporter.build_torch_policy_stacked(params, family, 45, 5,
                                                  NO_GOAL)
    rng = np.random.RandomState(1)
    frames = rng.randn(1, 5, 45).astype(np.float32)
    dims = (3, 3, 3, 12, 12, 12)
    off = np.cumsum((0,) + dims)
    x = np.concatenate([frames[:, :, off[t]:off[t + 1]].reshape(1, -1)
                        for t in range(6)], axis=1)
    out = pol(x)
    a_onnx = out[0] if isinstance(out, tuple) else out
    with torch.no_grad():
        t_out = stacked(torch.from_numpy(x))
    a_t = (t_out[0] if isinstance(t_out, tuple) else t_out).numpy()
    np.testing.assert_allclose(a_onnx, a_t, atol=1e-5)


def test_onnx_moe_weights_latent_outputs(tmp_path):
    """MoE ONNX exports also expose (weights, latent) like the reference
    (exporter.py:286-300): weights sum to 1, latent is L2-normalized."""
    pytest.importorskip("torch")
    from go2_rl_gym_tpu.export import onnx_native
    pc = _policy_cfg("moe_cts")
    model = make_cts_model("moe_cts", 45, 263, 12, pc, 5)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 45)),
                        jnp.zeros((1, 263)), jnp.zeros((1, 225)))
    path = exporter.export_policy_as_onnx(params, "moe_cts", str(tmp_path),
                                          obs_no_goal_mask=NO_GOAL)
    pol = onnx_native.OnnxPolicy(path)
    assert pol.output_names == ["actions", "weights", "latent"]
    x = np.random.RandomState(0).randn(1, 225).astype(np.float32)
    actions, weights, latent = pol(x)
    assert actions.shape == (1, 12)
    np.testing.assert_allclose(weights.sum(), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(latent), 1.0, atol=1e-5)


def test_lstm_export_matches_jax():
    """Recurrent policy TorchScript export (reference exporter.py
    forward_lstm:118-124): stateful hidden/cell buffers must reproduce the
    flax ActorCriticRecurrent actor path step for step."""
    torch = pytest.importorskip("torch")
    from go2_rl_gym_tpu.agents.recurrent import (ActorCriticRecurrent,
                                                 LSTMState)
    model = ActorCriticRecurrent(num_actions=12,
                                 actor_hidden_dims=(64, 32),
                                 critic_hidden_dims=(64, 32),
                                 rnn_hidden_size=32)
    mem = LSTMState(h=jnp.zeros((1, 32)), c=jnp.zeros((1, 32)))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 45)),
                        jnp.zeros((1, 45)), mem, mem)

    policy = exporter.build_torch_policy(params, "lstm", num_obs=45)
    scripted = torch.jit.script(policy)
    scripted.reset()

    obs_seq = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (6, 45)),
                         np.float32)
    state = mem
    for obs in obs_seq:
        mu, _, state = model.apply(params, jnp.asarray(obs)[None], state,
                                   method="actor_dist")
        got = scripted(torch.from_numpy(obs).unsqueeze(0))
        np.testing.assert_allclose(got.detach().numpy(), np.asarray(mu),
                                   atol=2e-5)


def test_committed_onnx_artifact_matches_reference_ts():
    """The committed doc/evidence/go2_cts_150k.onnx (generated by
    export/onnx_native.py from the imported reference checkpoint) must load
    in the in-repo ONNX runtime and match the reference TorchScript policy
    to 1e-5 on a random history."""
    torch = pytest.importorskip("torch")
    from go2_rl_gym_tpu.export import onnx_native
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    onnx_path = os.path.join(root, "doc", "evidence", "go2_cts_150k.onnx")
    ref_pt = "/root/reference/deploy/pre_train/go2/go2_cts_150k.pt"
    if not os.path.exists(onnx_path):
        pytest.skip("artifact not present")
    if not os.path.exists(ref_pt):
        pytest.skip("reference checkpoint not present")
    pol = onnx_native.OnnxPolicy(onnx_path)
    ref = torch.jit.load(ref_pt)
    rng = np.random.RandomState(0)
    frames = rng.randn(5, 45).astype(np.float32) * 0.5
    ref.reset()
    with torch.no_grad():
        for f in frames:
            want = ref(torch.from_numpy(f).unsqueeze(0))
    want = (want[0] if isinstance(want, (tuple, list)) else want).numpy()
    dims = (3, 3, 3, 12, 12, 12)
    off = np.cumsum((0,) + dims)
    x = np.concatenate([frames[None, :, off[t]:off[t + 1]].reshape(1, -1)
                        for t in range(6)], axis=1)
    got = pol(x)
    got = got[0] if isinstance(got, tuple) else got
    np.testing.assert_allclose(got, want, atol=1e-5)
