"""Reference-checkpoint importer tests.

* Round-trip: native params -> reference ``model_state_dict`` naming ->
  native params must be exact (the mapping inverts the exporter's transpose
  map, export/importer.py).
* Shipped-artifact parity: the reference's pre-trained
  ``go2_cts_150k.pt`` (reference deploy/pre_train/go2/) imported to native
  params must produce the same actions as the TorchScript module itself.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from go2_rl_gym_tpu.agents.networks import make_cts_model
from go2_rl_gym_tpu.env.config import PolicyCfg
from go2_rl_gym_tpu.export import importer

NO_GOAL = tuple([True] * 6 + [False] * 3 + [True] * 36)
REF_PT = "/root/reference/deploy/pre_train/go2/go2_cts_150k.pt"

FAMILIES = ["cts", "moe_cts", "moe_ng_cts", "mcp_cts", "ac_moe_cts",
            "dual_moe_cts"]


def _policy_cfg(family):
    dims = (512, 256, 256) if family in ("moe_cts", "dual_moe_cts") else (512, 256)
    return PolicyCfg(obs_no_goal_mask=NO_GOAL, student_encoder_hidden_dims=dims)


def _init_params(family, pc):
    model = make_cts_model(family, 45, 263, 12, pc, 5)
    return model, model.init(jax.random.PRNGKey(0), jnp.zeros((1, 45)),
                             jnp.zeros((1, 263)), jnp.zeros((1, 225)))


@pytest.mark.parametrize("family", FAMILIES)
def test_state_dict_round_trip(family):
    """native -> reference naming -> native is exact for every family."""
    pc = _policy_cfg(family)
    _, params = _init_params(family, pc)
    sd = importer.export_reference_state_dict(params, family)
    # every exported tensor is a Linear/Conv1d/std with reference naming
    for name in sd:
        assert name == "std" or ".weight" in name or ".bias" in name, name
    back = importer.import_reference_state_dict(sd, family)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(back)}
    assert len(flat_a) == len(flat_b)
    for path, a in flat_a:
        b = flat_b[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=jax.tree_util.keystr(path))


def test_round_trip_forward_equivalence():
    """Imported tree drives the model identically (moe_cts, full forward)."""
    family = "moe_cts"
    pc = _policy_cfg(family)
    model, params = _init_params(family, pc)
    back = importer.import_reference_state_dict(
        importer.export_reference_state_dict(params, family), family)
    back = jax.tree.map(jnp.asarray, back)

    obs = jax.random.normal(jax.random.PRNGKey(1), (4, 45))
    priv = jax.random.normal(jax.random.PRNGKey(2), (4, 263))
    hist = jax.random.normal(jax.random.PRNGKey(3), (4, 225))
    for method in ("t_latent",):
        np.testing.assert_allclose(
            np.asarray(model.apply(params, priv, method=method)),
            np.asarray(model.apply(back, priv, method=method)), atol=1e-6)
    lat_a, _ = model.apply(params, hist, method="s_latent")
    lat_b, _ = model.apply(back, hist, method="s_latent")
    np.testing.assert_allclose(np.asarray(lat_a), np.asarray(lat_b), atol=1e-6)
    mu_a, _, _ = model.apply(params, lat_a, obs, method="dist")
    mu_b, _, _ = model.apply(back, lat_b, obs, method="dist")
    np.testing.assert_allclose(np.asarray(mu_a), np.asarray(mu_b), atol=1e-6)


@pytest.mark.skipif(not os.path.exists(REF_PT),
                    reason="shipped reference checkpoint not present")
def test_shipped_reference_policy_parity():
    """go2_cts_150k.pt imported -> native student inference matches the
    TorchScript module to ~1e-5 over chained history steps."""
    torch = pytest.importorskip("torch")
    pc = _policy_cfg("cts")
    params = importer.complete_params(
        importer.import_policy_from_pt(REF_PT, "cts"), "cts", pc)
    model = make_cts_model("cts", 45, 263, 12, pc, 5)
    params = jax.tree.map(jnp.asarray, params)

    ts = torch.jit.load(REF_PT, map_location="cpu")
    ts.reset()

    hist = jnp.zeros((1, 5, 45))
    rng = np.random.RandomState(0)
    for _ in range(10):
        obs = (rng.randn(45).astype(np.float32) * 0.5)
        hist = jnp.concatenate([hist[:, 1:], jnp.asarray(obs)[None, None]],
                               axis=1)
        lat, _ = model.apply(params, hist.reshape(1, -1), method="s_latent")
        mu, _, _ = model.apply(params, lat, jnp.asarray(obs)[None],
                               method="dist")
        want = ts(torch.from_numpy(obs).unsqueeze(0))
        if isinstance(want, tuple):
            want = want[0]
        np.testing.assert_allclose(np.asarray(mu)[0],
                                   want.detach().numpy()[0], atol=5e-5)


@pytest.mark.skipif(not os.path.exists(REF_PT),
                    reason="shipped reference checkpoint not present")
def test_import_our_own_jit_export():
    """Our TorchScript deploy exports import back (deploy-artifact naming)."""
    pytest.importorskip("torch")
    from go2_rl_gym_tpu.export import exporter
    import tempfile
    family = "cts"
    pc = _policy_cfg(family)
    model, params = _init_params(family, pc)
    with tempfile.TemporaryDirectory() as d:
        path = exporter.export_policy_as_jit(params, family, d, num_obs=45,
                                             history_length=5,
                                             obs_no_goal_mask=NO_GOAL)
        back = importer.import_policy_from_pt(path, family)
    p = params["params"]
    b = back["params"]
    for mod in ("student_encoder", "actor"):
        for fc in p[mod]:
            np.testing.assert_allclose(np.asarray(p[mod][fc]["kernel"]),
                                       b[mod][fc]["kernel"], atol=1e-6)
