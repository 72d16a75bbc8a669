"""Reference (torch) optimizer-state interop — AdamSPD and AdamW.

The reference's training checkpoints carry the full
``optimizer_state_dict`` (``/root/reference/finetune/finetuner.py:260``)
and its ``load_checkpoint`` restores it unconditionally (:237) — so a
*complete* mid-run migration, in either direction, must convert the torch
``AdamSPD`` state: per-parameter ``exp_avg`` / ``exp_avg_sq`` / ``step``
keyed by parameter POSITION (``optimizers.py:57-77``) plus the anchor
weights in ``param_groups[0]['pre']`` (``finetuner.py:96-99``). A
weights-only import silently resets the Adam moments and — worse —
re-anchors SPD's projection at the mid-run weights instead of the
pretrained ones, changing the regularizer's meaning. This module converts
that state to/from our optax ``AdamSPDState`` exactly.

Position → name: the reference builds ONE param group from
``model.parameters()`` order (``finetuner.py:83-99``), which for HF
``CLIPModel`` is the module-registration order pinned by
``hf_named_parameter_order`` below (oracle-tested against a live
``transformers.CLIPModel`` in ``tests/test_optim_interop.py``). With
names in hand, the moment/anchor tensors convert through the SAME
mapping as the weights themselves
(``hf_import.params_from_hf_state_dict`` /
``hf_export.hf_state_dict_from_params``) — moments are parameter-shaped,
so the transpose/reshape rules are identical.

Step-count semantics line up exactly: torch increments ``state['step']``
before computing bias corrections (``optimizers.py:80-83``), our
``update_fn`` uses ``count + 1`` — after k steps both hold k.

The reference's other optimizer — plain ``torch.optim.AdamW`` with the
two-group decay split (``finetuner.py:61-79,102-103``) — converts the
same way (``adamw_state_from_reference`` /
``reference_adamw_optimizer_state_dict``): positions run across the
concatenated groups, decay group first.

The OpenAI clip-package naming (the count trainer) stays model-state
only: its parameter ORDER comes from the external ``clip`` package's
module tree, which is neither vendored here nor reachable in a
zero-egress environment, so it cannot be oracle-pinned.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional

import jax.numpy as jnp
import numpy as np

from ..config import CLIPConfig
from .adamspd import AdamSPDState

_FIELDS = ("count", "mu", "nu", "nu_max", "anchor")


def hf_named_parameter_order(cfg: CLIPConfig) -> List[str]:
    """``transformers.CLIPModel(cfg).named_parameters()`` order — the
    module-registration order of modeling_clip.py (logit_scale, text
    tower, vision tower, projections; attention registers k/v/q/out, the
    encoder layer registers attn, ln1, mlp, ln2). Buffers
    (``position_ids``) are not parameters and do not appear."""
    def lin(p):
        return [f"{p}.weight", f"{p}.bias"]

    def block(p):
        names = []
        for mod in ("self_attn.k_proj", "self_attn.v_proj",
                    "self_attn.q_proj", "self_attn.out_proj"):
            names += lin(f"{p}.{mod}")
        names += lin(f"{p}.layer_norm1")
        names += lin(f"{p}.mlp.fc1") + lin(f"{p}.mlp.fc2")
        names += lin(f"{p}.layer_norm2")
        return names

    order = ["logit_scale",  # CLIPModel.__init__ registers it first
             "text_model.embeddings.token_embedding.weight",
             "text_model.embeddings.position_embedding.weight"]
    for i in range(cfg.text.num_layers):
        order += block(f"text_model.encoder.layers.{i}")
    order += lin("text_model.final_layer_norm")
    order += ["vision_model.embeddings.class_embedding",
              "vision_model.embeddings.patch_embedding.weight",
              "vision_model.embeddings.position_embedding.weight"]
    order += lin("vision_model.pre_layrnorm")  # sic — HF attribute name
    for i in range(cfg.vision.num_layers):
        order += block(f"vision_model.encoder.layers.{i}")
    order += lin("vision_model.post_layernorm")
    order += ["visual_projection.weight", "text_projection.weight"]
    return order


def _scalar(x) -> int:
    """torch stores ``step`` as a python int (``optimizers.py:71``); newer
    torch optimizers use 0-d tensors — accept both."""
    return int(x.item() if hasattr(x, "item") else x)


def adamspd_state_from_reference(opt_sd: Mapping[str, Any],
                                 cfg: CLIPConfig) -> AdamSPDState:
    """torch ``AdamSPD.state_dict()`` (from a reference training
    checkpoint's ``optimizer_state_dict``) → our ``AdamSPDState``, with
    stacked-layers (checkpoint-layout) param trees."""
    from ..models.hf_import import params_from_hf_state_dict

    groups = opt_sd["param_groups"]
    if len(groups) != 1 or "pre" not in groups[0]:
        raise ValueError(
            "optimizer_state_dict is not reference AdamSPD state (expected "
            "one param group carrying 'pre' anchors, finetuner.py:96-99); "
            f"got {len(groups)} group(s) with keys "
            f"{[sorted(g) for g in groups]}")
    g = groups[0]
    order = hf_named_parameter_order(cfg)
    idxs = list(g["params"])
    if len(idxs) != len(order):
        raise ValueError(
            f"param-count mismatch: checkpoint group has {len(idxs)} "
            f"params, HF CLIPModel for this config has {len(order)} — "
            "wrong --model family?")
    state = {int(k): v for k, v in opt_sd["state"].items()}
    missing = [i for i in idxs if i not in state]
    if missing:
        raise ValueError(
            f"{len(missing)} params have no optimizer state (e.g. index "
            f"{missing[0]}) — the checkpoint was saved before any step?")
    steps = {_scalar(state[i]["step"]) for i in idxs}
    if len(steps) != 1:
        raise ValueError(
            f"non-uniform per-param step counts {sorted(steps)} — cannot "
            "map onto the single optax counter")

    mu = params_from_hf_state_dict(
        {order[i]: state[i]["exp_avg"] for i in idxs}, cfg)
    nu = params_from_hf_state_dict(
        {order[i]: state[i]["exp_avg_sq"] for i in idxs}, cfg)
    amsgrad = bool(g.get("amsgrad", False))
    if amsgrad:
        nu_max = params_from_hf_state_dict(
            {order[i]: state[i]["max_exp_avg_sq"] for i in idxs}, cfg)
    else:
        nu_max = jnp.zeros([], jnp.float32)
    pre = g.get("pre")
    if pre is not None:
        anchor = params_from_hf_state_dict(
            {order[i]: pre[j] for j, i in enumerate(idxs)}, cfg)
    else:
        # ``pre is None`` → the reference decays toward zeros
        # (optimizers.py:146).
        import jax
        anchor = jax.tree.map(jnp.zeros_like, mu)
    return AdamSPDState(count=jnp.asarray(steps.pop(), jnp.int32),
                        mu=mu, nu=nu, nu_max=nu_max, anchor=anchor)


def find_adamspd_state(tree: Any) -> Optional[AdamSPDState]:
    """Locate the (single) AdamSPD state inside an optax-chain opt_state —
    either live ``AdamSPDState`` namedtuples or the raw nested-dict form a
    structure-free orbax ``PyTreeRestore`` returns (field names become
    dict keys). Returns None if absent; raises if ambiguous."""
    found: List[AdamSPDState] = []

    def walk(node):
        if isinstance(node, AdamSPDState):
            found.append(node)
            return
        if isinstance(node, Mapping):
            if all(f in node for f in _FIELDS):
                found.append(AdamSPDState(**{f: node[f] for f in _FIELDS}))
                return
            for v in node.values():
                walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)

    walk(tree)
    if len(found) > 1:
        raise ValueError(f"{len(found)} AdamSPD states in the opt_state")
    return found[0] if found else None


def replace_adamspd_state(opt_state: Any,
                          new_state: AdamSPDState) -> Any:
    """Swap the AdamSPDState inside a live optax-chain opt_state."""
    from ..train.checkpoint import _map_adamspd_states

    hits = []

    def repl(_):
        hits.append(True)
        return new_state

    out = _map_adamspd_states(repl, opt_state)
    if len(hits) != 1:
        raise ValueError(
            f"expected exactly one AdamSPDState in the opt_state, found "
            f"{len(hits)} — is the optimizer 'adamspd'?")
    return out


def reference_optimizer_state_dict(opt_state: Any, cfg: CLIPConfig, *,
                                   lr: float, betas, eps: float,
                                   weight_decay: float,
                                   amsgrad: bool = False
                                   ) -> Dict[str, Any]:
    """Our opt_state (live, or orbax raw-restored) → a torch
    ``AdamSPD.state_dict()`` the reference's
    ``optimizer.load_state_dict`` consumes (``finetuner.py:237``).
    Hyperparameters land in the param group the way torch packs them."""
    import torch

    from ..models.hf_export import hf_state_dict_from_params

    state = opt_state if isinstance(opt_state, AdamSPDState) \
        else find_adamspd_state(opt_state)
    if state is None:
        raise ValueError("no AdamSPD state found in the opt_state — the "
                         "checkpoint was not trained with adamspd")

    def to_sd(tree):
        sd = hf_state_dict_from_params(tree, cfg)
        return {k: torch.from_numpy(np.array(v, copy=True))
                for k, v in sd.items()}

    order = hf_named_parameter_order(cfg)
    mu_sd, nu_sd = to_sd(state.mu), to_sd(state.nu)
    anchor_sd = to_sd(state.anchor)
    if set(mu_sd) != set(order):  # pragma: no cover - mapping invariant
        raise AssertionError("moment-tree names do not cover the HF "
                             "parameter set")
    nu_max_sd = to_sd(state.nu_max) if amsgrad else None
    step = _scalar(np.asarray(state.count))

    packed: Dict[int, Dict[str, Any]] = {}
    for i, name in enumerate(order):
        entry = {"step": step, "exp_avg": mu_sd[name],
                 "exp_avg_sq": nu_sd[name]}
        if nu_max_sd is not None:
            entry["max_exp_avg_sq"] = nu_max_sd[name]
        packed[i] = entry
    group = {"lr": float(lr), "betas": tuple(betas), "eps": float(eps),
             "weight_decay": float(weight_decay), "amsgrad": bool(amsgrad),
             "pre": [anchor_sd[name] for name in order],
             "params": list(range(len(order)))}
    return {"state": packed, "param_groups": [group]}


# ---------------------------------------------------------------------------
# AdamW (the reference's non-SPD path, finetuner.py:70-79,102-103)
# ---------------------------------------------------------------------------

def adamw_group_orders(cfg: CLIPConfig):
    """The reference's AdamW uses TWO param groups split by the literal
    name filter ``"ln" in name or "bn" in name or "bias" in name``
    (``finetuner.py:64-68``) — against HF CLIP's actual names only
    ``"bias"`` ever matches (pinned in tests). torch assigns state
    indices across the concatenated groups in order, so the global
    position → name map is decay-group names followed by no-decay-group
    names."""
    no_decay = lambda n: "ln" in n or "bn" in n or "bias" in n
    order = hf_named_parameter_order(cfg)
    return ([n for n in order if not no_decay(n)],
            [n for n in order if no_decay(n)])


def _find_scale_by_adam(tree: Any):
    """Locate the (single) optax ``ScaleByAdamState`` — live namedtuple
    or the orbax raw-restore dict form (keys count/mu/nu)."""
    import optax

    found = []

    def walk(node):
        if isinstance(node, optax.ScaleByAdamState):
            found.append(node)
            return
        if isinstance(node, AdamSPDState):
            return
        if isinstance(node, Mapping):
            if set(node.keys()) == {"count", "mu", "nu"}:
                found.append(optax.ScaleByAdamState(
                    count=node["count"], mu=node["mu"], nu=node["nu"]))
                return
            for v in node.values():
                walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)

    walk(tree)
    if len(found) > 1:
        raise ValueError(f"{len(found)} ScaleByAdamState in the opt_state")
    return found[0] if found else None


def adamw_state_from_reference(opt_sd: Mapping[str, Any], cfg: CLIPConfig):
    """torch ``AdamW.state_dict()`` (reference two-group wiring) → an
    optax ``ScaleByAdamState`` with stacked-layers param trees. Inject it
    with ``replace_scale_by_adam``."""
    import optax

    from ..models.hf_import import params_from_hf_state_dict

    groups = opt_sd["param_groups"]
    if any("pre" in g for g in groups):
        raise ValueError("checkpoint carries AdamSPD state — use "
                         "adamspd_state_from_reference")
    decay, no_decay = adamw_group_orders(cfg)
    # Two groups = the finetuner's decay split (positions run decay group
    # first); one group = plain AdamW(model.parameters()) whose positions
    # are simply registration order.
    expect = [decay, no_decay] if len(groups) == 2 else \
        [hf_named_parameter_order(cfg)]
    if [len(g["params"]) for g in groups] != [len(e) for e in expect]:
        raise ValueError(
            f"group sizes {[len(g['params']) for g in groups]} do not "
            f"match the reference decay split {[len(e) for e in expect]} "
            "for this model config")
    pos_name: Dict[int, str] = {}
    for g, names in zip(groups, expect):
        for idx, name in zip(g["params"], names):
            pos_name[int(idx)] = name
    state = {int(k): v for k, v in opt_sd["state"].items()}
    missing = [i for i in pos_name if i not in state]
    if missing:
        raise ValueError(f"{len(missing)} params have no optimizer state "
                         f"(e.g. index {missing[0]})")
    steps = {_scalar(state[i]["step"]) for i in pos_name}
    if len(steps) != 1:
        raise ValueError(f"non-uniform per-param step counts "
                         f"{sorted(steps)}")
    mu = params_from_hf_state_dict(
        {n: state[i]["exp_avg"] for i, n in pos_name.items()}, cfg)
    nu = params_from_hf_state_dict(
        {n: state[i]["exp_avg_sq"] for i, n in pos_name.items()}, cfg)
    return optax.ScaleByAdamState(
        count=jnp.asarray(steps.pop(), jnp.int32), mu=mu, nu=nu)


def replace_scale_by_adam(opt_state: Any, new_state) -> Any:
    """Swap the ScaleByAdamState inside a live optax opt_state tree."""
    import optax

    from ..train.checkpoint import _map_matching_states

    hits = []

    def repl(_):
        hits.append(True)
        return new_state

    out = _map_matching_states(optax.ScaleByAdamState, repl, opt_state)
    if len(hits) != 1:
        raise ValueError(f"expected exactly one ScaleByAdamState, found "
                         f"{len(hits)} — is the optimizer 'adamw'?")
    return out


def reference_adamw_optimizer_state_dict(opt_state: Any, cfg: CLIPConfig,
                                         *, lr: float, betas, eps: float,
                                         weight_decay: float
                                         ) -> Dict[str, Any]:
    """Our adamw opt_state → a torch ``AdamW.state_dict()`` with the
    reference's two-group decay split (``finetuner.py:70-79``), loadable
    by ``optimizer.load_state_dict`` on the reference side."""
    import torch

    from ..models.hf_export import hf_state_dict_from_params

    state = _find_scale_by_adam(opt_state)
    if state is None:
        raise ValueError("no ScaleByAdamState found — the checkpoint was "
                         "not trained with adamw")

    def to_sd(tree):
        sd = hf_state_dict_from_params(tree, cfg)
        return {k: torch.from_numpy(np.array(v, copy=True))
                for k, v in sd.items()}

    mu_sd, nu_sd = to_sd(state.mu), to_sd(state.nu)
    decay, no_decay = adamw_group_orders(cfg)
    step = torch.tensor(float(_scalar(np.asarray(state.count))))
    packed: Dict[int, Dict[str, Any]] = {}
    for i, name in enumerate(decay + no_decay):
        packed[i] = {"step": step.clone(), "exp_avg": mu_sd[name],
                     "exp_avg_sq": nu_sd[name]}
    base = dict(lr=float(lr), betas=tuple(betas), eps=float(eps),
                amsgrad=False, maximize=False, foreach=None,
                capturable=False, differentiable=False, fused=None,
                decoupled_weight_decay=True)
    g0 = dict(base, weight_decay=float(weight_decay),
              params=list(range(len(decay))))
    g1 = dict(base, weight_decay=0.0,
              params=list(range(len(decay), len(decay) + len(no_decay))))
    return {"state": packed, "param_groups": [g0, g1]}
