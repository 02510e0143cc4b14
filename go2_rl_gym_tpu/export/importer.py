"""Reference-checkpoint importer: torch ``.pt`` -> native flax params.

The reference stack ships/produces two kinds of ``.pt`` artifacts:

* **deploy artifacts** — TorchScript modules exported by
  legged_gym/utils/exporter.py:67-192 (e.g. the shipped
  ``deploy/pre_train/go2/go2_cts_150k.pt``): a single-env policy with an
  embedded history ring buffer, containing only the inference-path modules
  (student encoder + actor).
* **training checkpoints** — ``torch.save`` dicts with ``model_state_dict``
  (reference on_policy_runner_cts.py:287-295) holding the full ActorCritic*
  module tree (teacher/student encoders, actor, critic, std).

This module maps either into the CTSFamily param tree (agents/networks.py),
inverting the exporter's transpose map (export/exporter.py:48-69): torch
Linear weights are (out, in) -> flax kernels (in, out); the reference's
grouped Conv1d expert heads (rsl_rl/modules/utils.py:83-94, weight
(E*O, H, 1)) -> einsum head_kernel (E, H, O).

``export_reference_state_dict`` provides the inverse (native -> reference
``model_state_dict`` naming) so checkpoints can round-trip between the two
stacks and be loaded by the reference's own load_state_dict.
"""
from __future__ import annotations

import re
from typing import Dict, Optional

import numpy as np

# ---------------------------------------------------------------------------
# torch -> numpy tensor collection
# ---------------------------------------------------------------------------


def tensors_from_pt(path: str) -> Dict[str, np.ndarray]:
    """Load any reference ``.pt`` into a flat {name: ndarray} dict.

    TorchScript artifacts yield their named_parameters; raw torch.save dicts
    yield model_state_dict (training checkpoints) or the dict itself."""
    import torch
    try:
        mod = torch.jit.load(path, map_location="cpu")
        out = {n: p.detach().cpu().numpy() for n, p in mod.named_parameters()}
        out.update({n: b.detach().cpu().numpy()
                    for n, b in mod.named_buffers() if n != "history"})
        return out
    except RuntimeError:
        pass
    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model_state_dict" in blob:
        blob = blob["model_state_dict"]
    return {n: t.detach().cpu().numpy() for n, t in blob.items()
            if hasattr(t, "detach")}


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def _norm_name(name: str) -> str:
    """Collapse the reference utils.MLP's ``.network`` wrapper and the
    gating Sequential's leading MLP index so every Linear ends with
    ``<prefix>.<int>.weight``."""
    name = name.replace(".network.", ".")
    return name


def _mlp_from_sd(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    """Collect ``<prefix>.<i>.weight/bias`` Linears -> flax MLP params."""
    pat = re.compile(re.escape(prefix) + r"\.(\d+)\.weight$")
    idxs = sorted(int(m.group(1)) for k in sd
                  if (m := pat.match(k)) is not None)
    if not idxs:
        raise KeyError(f"no Linear layers under '{prefix}'")
    out = {}
    for j, i in enumerate(idxs):
        w = np.asarray(sd[f"{prefix}.{i}.weight"], np.float32)
        b = np.asarray(sd[f"{prefix}.{i}.bias"], np.float32)
        out[f"fc{j}"] = {"kernel": w.T.copy(), "bias": b.copy()}
    return out


def _mlp_to_sd(params: Dict, prefix: str, sd: Dict[str, np.ndarray],
               stride: int = 2):
    """Inverse of _mlp_from_sd: flax MLP -> ``<prefix>.<2j>.weight/bias``
    (reference Sequentials put Linears at even indices, activations between)."""
    keys = sorted(params.keys(), key=lambda k: int(k[2:]))
    for j, k in enumerate(keys):
        sd[f"{prefix}.{j * stride}.weight"] = np.asarray(
            params[k]["kernel"], np.float32).T.copy()
        sd[f"{prefix}.{j * stride}.bias"] = np.asarray(
            params[k]["bias"], np.float32).copy()


def _conv_head_from_sd(sd, key_w, key_b, expert_num: int) -> Dict:
    """Grouped Conv1d (E*O, H, 1) -> head_kernel (E, H, O), head_bias (E, O)."""
    w = np.asarray(sd[key_w], np.float32)
    b = np.asarray(sd[key_b], np.float32)
    EO, H, _ = w.shape
    O = EO // expert_num
    kernel = w[..., 0].reshape(expert_num, O, H).transpose(0, 2, 1)
    return {"head_kernel": np.ascontiguousarray(kernel),
            "head_bias": b.reshape(expert_num, O).copy()}


def _conv_head_to_sd(experts: Dict, key_w, key_b, sd):
    k = np.asarray(experts["head_kernel"], np.float32)   # (E, H, O)
    b = np.asarray(experts["head_bias"], np.float32)     # (E, O)
    E, H, O = k.shape
    sd[key_w] = np.ascontiguousarray(
        k.transpose(0, 2, 1).reshape(E * O, H))[..., None]
    sd[key_b] = b.reshape(E * O).copy()


def _experts_from_sd(sd, backbone_prefix, hidden_key_prefix, conv_prefix,
                     expert_num):
    """Reference split backbone (experts_backbone + experts_hidden.0 + conv)
    -> our Experts params (backbone MLP with the hidden Linear as last fc)."""
    backbone = _mlp_from_sd(sd, backbone_prefix)
    nfc = len(backbone)
    hid_w = np.asarray(sd[f"{hidden_key_prefix}.0.weight"], np.float32)
    hid_b = np.asarray(sd[f"{hidden_key_prefix}.0.bias"], np.float32)
    backbone[f"fc{nfc}"] = {"kernel": hid_w.T.copy(), "bias": hid_b.copy()}
    out = {"backbone": backbone}
    out.update(_conv_head_from_sd(sd, f"{conv_prefix}.weight",
                                  f"{conv_prefix}.bias", expert_num))
    return out


def _experts_to_sd(experts: Dict, backbone_prefix, hidden_key_prefix,
                   conv_prefix, sd):
    backbone = dict(experts["backbone"])
    keys = sorted(backbone.keys(), key=lambda k: int(k[2:]))
    hidden = backbone.pop(keys[-1])
    _mlp_to_sd(backbone, backbone_prefix, sd)
    sd[f"{hidden_key_prefix}.0.weight"] = np.asarray(
        hidden["kernel"], np.float32).T.copy()
    sd[f"{hidden_key_prefix}.0.bias"] = np.asarray(
        hidden["bias"], np.float32).copy()
    _conv_head_to_sd(experts, f"{conv_prefix}.weight", f"{conv_prefix}.bias",
                     sd)


def _fused_experts_from_sd(sd, prefix, expert_num):
    """utils.Experts (backbone MLP ends in the E*H layer + conv named
    ``<prefix>.experts``) -> our Experts params."""
    return {
        "backbone": _mlp_from_sd(sd, f"{prefix}.backbone"),
        **_conv_head_from_sd(sd, f"{prefix}.experts.weight",
                             f"{prefix}.experts.bias", expert_num),
    }


def _fused_experts_to_sd(experts, prefix, sd):
    _mlp_to_sd(experts["backbone"], f"{prefix}.backbone", sd)
    _conv_head_to_sd(experts, f"{prefix}.experts.weight",
                     f"{prefix}.experts.bias", sd)


def _infer_expert_num(sd, gating_prefix) -> int:
    pat = re.compile(re.escape(gating_prefix) + r"\.(\d+)\.weight$")
    idxs = sorted(int(m.group(1)) for k in sd
                  if (m := pat.match(k)) is not None)
    return sd[f"{gating_prefix}.{idxs[-1]}.weight"].shape[0]


# ---------------------------------------------------------------------------
# family importers (training state_dict naming)
# ---------------------------------------------------------------------------


def import_reference_state_dict(sd: Dict[str, np.ndarray],
                                family: str) -> Dict:
    """Reference ``model_state_dict`` -> ``{"params": CTSFamily tree}``.

    Handles the six families' module layouts (reference
    actor_critic_cts.py / actor_critic_moe_cts.py / actor_critic_moe_ng_cts.py
    / actor_critic_mcp_cts.py / actor_critic_ac_moe_cts.py /
    actor_critic_dual_moe_cts.py). Missing modules (e.g. deploy artifacts
    without teacher/critic) are simply absent from the result."""
    sd = {_norm_name(k): v for k, v in sd.items()}
    p: Dict = {}

    def maybe_mlp(dst, prefix):
        try:
            p[dst] = _mlp_from_sd(sd, prefix)
            return True
        except KeyError:
            return False

    maybe_mlp("teacher_encoder", "teacher_encoder")

    # --- student encoder ---
    if family in ("moe_cts", "dual_moe_cts"):
        E = _infer_expert_num(sd, "student_moe_encoder.moe.gating_network.0")
        p["student_encoder"] = {"moe": {
            "experts": _fused_experts_from_sd(
                sd, "student_moe_encoder.moe.experts", E),
            "gating": _mlp_from_sd(sd,
                                   "student_moe_encoder.moe.gating_network.0"),
        }}
    elif family == "moe_ng_cts":
        E = _infer_expert_num(sd, "student_moe_encoder.gating_network")
        p["student_encoder"] = {
            "experts": _experts_from_sd(
                sd, "student_moe_encoder.experts_backbone",
                "student_moe_encoder.experts_hidden",
                "student_moe_encoder.experts_out", E),
            "gating": _mlp_from_sd(sd, "student_moe_encoder.gating_network"),
        }
    else:
        maybe_mlp("student_encoder", "student_encoder")

    # --- actor ---
    if family == "mcp_cts":
        E = _infer_expert_num(sd, "actor_mcp.gating_network")
        p["actor"] = {
            "experts": _experts_from_sd(sd, "actor_mcp.experts_backbone",
                                        "actor_mcp.experts_hidden",
                                        "actor_mcp.experts_out", E),
            "gating": _mlp_from_sd(sd, "actor_mcp.gating_network"),
        }
    elif family in ("ac_moe_cts", "dual_moe_cts"):
        E = _infer_expert_num(sd, "actor_moe.gating_network.0")
        p["actor"] = {
            "experts": _fused_experts_from_sd(sd, "actor_moe.experts", E),
            "gating": _mlp_from_sd(sd, "actor_moe.gating_network.0"),
        }
    else:
        maybe_mlp("actor", "actor")

    # --- critic ---
    if family in ("ac_moe_cts", "dual_moe_cts"):
        if any(k.startswith("critic_experts.") for k in sd):
            E = p["actor"]["gating"][sorted(
                p["actor"]["gating"])[-1]]["kernel"].shape[1]
            p["critic"] = _fused_experts_from_sd(sd, "critic_experts", E)
    else:
        maybe_mlp("critic", "critic")

    if "std" in sd and family != "mcp_cts":
        p["std"] = np.asarray(sd["std"], np.float32).copy()
    return {"params": p}


def export_reference_state_dict(params: Dict, family: str) -> Dict[str,
                                                                   np.ndarray]:
    """Native CTSFamily params -> reference ``model_state_dict`` naming
    (loadable by the reference's ActorCritic*.load_state_dict for matching
    configs)."""
    p = params["params"] if "params" in params else params
    sd: Dict[str, np.ndarray] = {}

    if "teacher_encoder" in p:
        _mlp_to_sd(p["teacher_encoder"], "teacher_encoder", sd)

    if "student_encoder" in p:
        se = p["student_encoder"]
        if family in ("moe_cts", "dual_moe_cts"):
            _fused_experts_to_sd(se["moe"]["experts"],
                                 "student_moe_encoder.moe.experts", sd)
            _mlp_to_sd(se["moe"]["gating"],
                       "student_moe_encoder.moe.gating_network.0.network", sd)
        elif family == "moe_ng_cts":
            _experts_to_sd(se["experts"],
                           "student_moe_encoder.experts_backbone",
                           "student_moe_encoder.experts_hidden",
                           "student_moe_encoder.experts_out", sd)
            _mlp_to_sd(se["gating"], "student_moe_encoder.gating_network", sd)
        else:
            _mlp_to_sd(se, "student_encoder", sd)

    if "actor" in p:
        a = p["actor"]
        if family == "mcp_cts":
            _experts_to_sd(a["experts"], "actor_mcp.experts_backbone",
                           "actor_mcp.experts_hidden", "actor_mcp.experts_out",
                           sd)
            _mlp_to_sd(a["gating"], "actor_mcp.gating_network", sd)
        elif family in ("ac_moe_cts", "dual_moe_cts"):
            _fused_experts_to_sd(a["experts"], "actor_moe.experts", sd)
            _mlp_to_sd(a["gating"], "actor_moe.gating_network.0.network", sd)
        else:
            _mlp_to_sd(a, "actor", sd)

    if "critic" in p:
        c = p["critic"]
        if family in ("ac_moe_cts", "dual_moe_cts"):
            _fused_experts_to_sd(c, "critic_experts", sd)
        else:
            _mlp_to_sd(c, "critic", sd)

    if "std" in p:
        sd["std"] = np.asarray(p["std"], np.float32).copy()
    return sd


# ---------------------------------------------------------------------------
# deploy-artifact importers (TorchScript naming)
# ---------------------------------------------------------------------------


def _import_deploy_tensors(sd: Dict[str, np.ndarray],
                           family: Optional[str]) -> Dict:
    """Map a TorchScript deploy artifact's tensors (either the reference
    exporter's naming — exporter.py:67-192 — or ours, exporter.build_torch_policy)
    into partial CTSFamily params (inference modules only)."""
    sd = {_norm_name(k): v for k, v in sd.items()}
    p: Dict = {}

    # reference CTS deploy artifact / training dicts share the naming; ours
    # names the student MLP 'student'
    for prefix in ("student_encoder", "student"):
        try:
            p["student_encoder"] = _mlp_from_sd(sd, prefix)
            break
        except KeyError:
            continue

    if any(k.startswith("student_moe_encoder.") for k in sd):
        return import_reference_state_dict(sd, family or "moe_cts")
    if any(k.startswith(("backbone.", "gating.")) for k in sd):
        # our moe_cts deploy export: backbone/gating Sequentials + head_w/b
        E = _infer_expert_num(sd, "gating")
        experts = {"backbone": _mlp_from_sd(sd, "backbone"),
                   "head_kernel": np.asarray(sd["head_w"], np.float32).copy(),
                   "head_bias": np.asarray(sd["head_b"], np.float32).copy()}
        p["student_encoder"] = {"moe": {"experts": experts,
                                        "gating": _mlp_from_sd(sd, "gating")}}

    try:
        p["actor"] = _mlp_from_sd(sd, "actor")
    except KeyError:
        pass
    return {"params": p}


def complete_params(partial: Dict, family: str, policy_cfg, num_obs: int = 45,
                    num_critic_obs: int = 263, num_actions: int = 12,
                    history_length: int = 5) -> Dict:
    """Overlay imported (possibly partial) params onto a freshly-initialized
    CTSFamily tree, so flax ``apply`` sees every module (deploy artifacts
    carry only the inference path; teacher/critic/std stay at init)."""
    import jax
    import jax.numpy as jnp
    from go2_rl_gym_tpu.agents.networks import make_cts_model
    model = make_cts_model(family, num_obs, num_critic_obs, num_actions,
                           policy_cfg, history_length)
    full = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, num_obs)),
                      jnp.zeros((1, num_critic_obs)),
                      jnp.zeros((1, history_length * num_obs)))
    full = jax.tree.map(np.asarray, full)

    def overlay(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                overlay(dst[k], v)
            else:
                assert np.shape(dst[k]) == np.shape(v), \
                    f"shape mismatch at {k}: {np.shape(dst[k])} vs {np.shape(v)}"
                dst[k] = np.asarray(v, np.float32)

    src = partial["params"] if "params" in partial else partial
    overlay(full["params"], src)
    return full


def import_policy_from_pt(path: str, family: str = "cts") -> Dict:
    """Load any reference/our ``.pt`` into native params.

    Training checkpoints yield the full tree; deploy artifacts yield the
    inference modules (student encoder + actor), enough for
    deploy.mujoco_eval.JaxPolicy / the exporters."""
    sd = tensors_from_pt(path)
    if any(k.startswith(("teacher_encoder.", "critic.", "critic_experts."))
           for k in sd):
        return import_reference_state_dict(sd, family)
    return _import_deploy_tensors(sd, family)
