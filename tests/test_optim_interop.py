"""Reference AdamSPD optimizer-state interop (optim/interop.py).

The reference's ``load_checkpoint`` restores ``optimizer_state_dict``
unconditionally (``finetuner.py:237``), so full mid-run migration needs
the torch AdamSPD state converted, not just the weights. Pinned here:

* the HF parameter-ORDER assumption (position → name) against a live
  ``transformers.CLIPModel``;
* trajectory equality when a run trained k steps under the live
  reference optimizer continues in this framework (import direction);
* trajectory equality when a run trained here continues under the live
  reference optimizer after ``load_state_dict`` (export direction).
"""

import importlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from clip_finegrained_alignment_tpu.config import CLIPConfig, TrainConfig
from clip_finegrained_alignment_tpu.models import clip as m
from clip_finegrained_alignment_tpu.models.hf_export import (
    hf_state_dict_from_params)
from clip_finegrained_alignment_tpu.models.hf_import import (
    params_from_hf_state_dict)
from clip_finegrained_alignment_tpu.optim import interop
from clip_finegrained_alignment_tpu.optim.adamspd import adamspd
from clip_finegrained_alignment_tpu.optim.factory import (
    make_optimizer, stacked_layer_mask)

CFG = CLIPConfig.tiny_test()
HP = dict(lr=1e-2, betas=(0.9, 0.98), eps=5e-6, weight_decay=0.3)


def _import_ref(subdir: str, name: str):
    path = f"/root/reference/{subdir}"
    if name in sys.modules:
        return sys.modules[name]
    sys.path.insert(0, path)
    try:
        return importlib.import_module(name)
    finally:
        sys.path.remove(path)


ref_optim = _import_ref("finetune", "optimizers")


def _hf_model():
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.CLIPConfig(
        projection_dim=CFG.projection_dim,
        text_config=dict(
            vocab_size=CFG.text.vocab_size,
            hidden_size=CFG.text.hidden_size,
            intermediate_size=CFG.text.intermediate_size,
            num_hidden_layers=CFG.text.num_layers,
            num_attention_heads=CFG.text.num_heads,
            max_position_embeddings=CFG.text.max_position_embeddings),
        vision_config=dict(
            image_size=CFG.vision.image_size,
            patch_size=CFG.vision.patch_size,
            hidden_size=CFG.vision.hidden_size,
            intermediate_size=CFG.vision.intermediate_size,
            num_hidden_layers=CFG.vision.num_layers,
            num_attention_heads=CFG.vision.num_heads))
    return transformers.CLIPModel(hf_cfg)


def _grads(model, seed):
    rng = np.random.default_rng(1000 + seed)
    return {n: np.asarray(0.1 * rng.standard_normal(tuple(p.shape)),
                          dtype=np.float32)
            for n, p in model.named_parameters()}


def _torch_step(model, opt, grads):
    for n, p in model.named_parameters():
        p.grad = torch.from_numpy(grads[n].copy())
    opt.step()


def _our_step(opt, params, state, grads):
    gt = params_from_hf_state_dict(grads, CFG)
    upd, state = opt.update(gt, state, params)
    return jax.tree.map(lambda p, u: p + u, params, upd), state


def _assert_tree_close(ours, want, rtol=3e-5, atol=3e-5):
    flat_a, _ = jax.tree_util.tree_flatten_with_path(ours)
    flat_b = jax.tree.leaves(want)
    assert len(flat_a) == len(flat_b)
    for (path, a), b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=atol,
            err_msg=jax.tree_util.keystr(path))


def test_hf_named_parameter_order_matches_transformers():
    """The position → name map everything else rests on: our generated
    order must equal the live CLIPModel.named_parameters() order."""
    model = _hf_model()
    got = interop.hf_named_parameter_order(CFG)
    want = [n for n, _ in model.named_parameters()]
    assert got == want


def test_import_midrun_continues_reference_trajectory():
    """k steps under the LIVE reference AdamSPD → state_dict → import →
    n more steps here == k+n steps under the reference. Anchors, moments,
    and the step counter must all carry over (the SPD projection decision
    depends on all three)."""
    model = _hf_model()
    pre = [p.detach().clone() for p in model.parameters()]  # finetuner.py:86
    opt_t = ref_optim.AdamSPD([{"params": list(model.parameters()),
                                "pre": pre}], amsgrad=False, **HP)
    for s in range(3):
        _torch_step(model, opt_t, _grads(model, s))

    params = params_from_hf_state_dict(
        {k: v.clone() for k, v in model.state_dict().items()}, CFG)
    state = interop.adamspd_state_from_reference(opt_t.state_dict(), CFG)
    assert int(state.count) == 3
    # anchor must be the ORIGINAL pretrained weights, not the mid-run ones
    _assert_tree_close(state.anchor, params_from_hf_state_dict(
        {n: p for (n, _), p in zip(model.named_parameters(), pre)}, CFG),
        rtol=0, atol=0)

    opt_j = adamspd(HP["lr"], b1=HP["betas"][0], b2=HP["betas"][1],
                    eps=HP["eps"], weight_decay=HP["weight_decay"],
                    amsgrad=False, stacked_mask=stacked_layer_mask(params))
    for s in range(3, 6):
        g = _grads(model, s)
        params, state = _our_step(opt_j, params, state, g)
        _torch_step(model, opt_t, g)

    want = params_from_hf_state_dict(model.state_dict(), CFG)
    _assert_tree_close(params, want)


def test_export_optimizer_state_loads_into_reference():
    """k steps here → reference_optimizer_state_dict →
    AdamSPD.load_state_dict → n more reference steps == k+n steps here.
    Exercises find_adamspd_state on the real make_optimizer chain state
    (clip_by_global_norm wrapper included)."""
    params = m.init_clip_params(jax.random.key(7), CFG)
    tc = TrainConfig(optimizer_type="adamspd", lr=HP["lr"],
                     betas=HP["betas"], eps=HP["eps"],
                     weight_decay=HP["weight_decay"],
                     max_grad_norm=1e9)  # wrapper present, clip a no-op
    opt_j = make_optimizer(tc, params)
    state = opt_j.init(params)

    model = _hf_model()  # shape donor for named grads
    for s in range(10, 13):
        params, state = _our_step(opt_j, params, state, _grads(model, s))

    sd_opt = interop.reference_optimizer_state_dict(
        state, CFG, amsgrad=False, **HP)
    sd_model = {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in hf_state_dict_from_params(params, CFG).items()}
    res = model.load_state_dict(sd_model, strict=False)
    assert not res.unexpected_keys
    placeholder = [torch.zeros_like(p) for p in model.parameters()]
    opt_t = ref_optim.AdamSPD([{"params": list(model.parameters()),
                                "pre": placeholder}], amsgrad=False, **HP)
    opt_t.load_state_dict(sd_opt)  # restores moments, step AND 'pre'

    for s in range(13, 15):
        g = _grads(model, s)
        params, state = _our_step(opt_j, params, state, g)
        _torch_step(model, opt_t, g)

    want = params_from_hf_state_dict(model.state_dict(), CFG)
    _assert_tree_close(params, want)


def test_import_export_roundtrip_bitexact():
    """import(export(state)) reproduces mu/nu/anchor/count bit-exactly."""
    params = m.init_clip_params(jax.random.key(3), CFG)
    tc = TrainConfig(optimizer_type="adamspd", max_grad_norm=0.0)
    opt_j = make_optimizer(tc, params)
    state = opt_j.init(params)
    model = _hf_model()
    params2, state = _our_step(opt_j, params, state, _grads(model, 99))

    sd = interop.reference_optimizer_state_dict(state, CFG, amsgrad=False,
                                                **HP)
    back = interop.adamspd_state_from_reference(sd, CFG)
    inner = interop.find_adamspd_state(state)
    assert int(back.count) == int(inner.count)
    for field in ("mu", "nu", "anchor"):
        _assert_tree_close(getattr(back, field), getattr(inner, field),
                           rtol=0, atol=0)

    # and replace_adamspd_state installs it back into the chain state
    swapped = interop.replace_adamspd_state(state, back)
    assert interop.find_adamspd_state(swapped) is back


# ---------------------------------------------------------------------------
# AdamW (the reference's non-SPD path: two-group decay split,
# finetuner.py:61-79,102-103)
# ---------------------------------------------------------------------------

def _ref_adamw(model):
    """The finetuner's configure_optimizer AdamW wiring: decay /
    no-decay groups split by the literal name filter (finetuner.py:64-68)."""
    decay, no_decay = [], []
    for name, param in model.named_parameters():
        if "ln" in name or "bn" in name or "bias" in name:
            no_decay.append(param)
        else:
            decay.append(param)
    return torch.optim.AdamW(
        [{"params": decay, "weight_decay": HP["weight_decay"]},
         {"params": no_decay, "weight_decay": 0.0}],
        lr=HP["lr"], betas=HP["betas"], eps=HP["eps"])


def _our_adamw():
    tc = TrainConfig(optimizer_type="adamw", lr=HP["lr"], betas=HP["betas"],
                     eps=HP["eps"], weight_decay=HP["weight_decay"],
                     max_grad_norm=1e9)
    # decay_mask is path-based, so any params-shaped tree works here
    return make_optimizer(tc, m.init_clip_params(jax.random.key(0), CFG))


def test_adamw_group_split_matches_reference_filter():
    """The reference's 'ln|bn|bias' filter on real HF CLIP names catches
    only biases (factory.decay_mask's documented premise) — pinned
    against the live name set."""
    model = _hf_model()
    no_decay = [n for n, _ in model.named_parameters()
                if "ln" in n or "bn" in n or "bias" in n]
    assert no_decay and all(n.endswith("bias") for n in no_decay)
    decay, nd = interop.adamw_group_orders(CFG)
    assert nd == no_decay
    assert decay + nd and len(decay) + len(nd) == \
        len(interop.hf_named_parameter_order(CFG))


def test_import_adamw_midrun_continues_reference_trajectory():
    model = _hf_model()
    opt_t = _ref_adamw(model)
    for s in range(3):
        _torch_step(model, opt_t, _grads(model, s))

    params = params_from_hf_state_dict(
        {k: v.clone() for k, v in model.state_dict().items()}, CFG)
    imported = interop.adamw_state_from_reference(opt_t.state_dict(), CFG)
    assert int(imported.count) == 3

    opt_j = _our_adamw()
    state = interop.replace_scale_by_adam(opt_j.init(params), imported)
    for s in range(3, 6):
        g = _grads(model, s)
        gt = params_from_hf_state_dict(g, CFG)
        upd, state = opt_j.update(gt, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, upd)
        _torch_step(model, opt_t, g)

    _assert_tree_close(params, params_from_hf_state_dict(
        model.state_dict(), CFG))


def test_export_adamw_state_loads_into_reference():
    params = m.init_clip_params(jax.random.key(11), CFG)
    opt_j = _our_adamw()
    state = opt_j.init(params)
    model = _hf_model()  # shape donor for named grads
    for s in range(20, 23):
        g = _grads(model, s)
        gt = params_from_hf_state_dict(g, CFG)
        upd, state = opt_j.update(gt, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, upd)

    sd_opt = interop.reference_adamw_optimizer_state_dict(
        state, CFG, lr=HP["lr"], betas=HP["betas"], eps=HP["eps"],
        weight_decay=HP["weight_decay"])
    sd_model = {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
                for k, v in hf_state_dict_from_params(params, CFG).items()}
    model.load_state_dict(sd_model, strict=False)
    opt_t = _ref_adamw(model)
    opt_t.load_state_dict(sd_opt)

    for s in range(23, 25):
        g = _grads(model, s)
        gt = params_from_hf_state_dict(g, CFG)
        upd, state = opt_j.update(gt, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, upd)
        _torch_step(model, opt_t, g)

    _assert_tree_close(params, params_from_hf_state_dict(
        model.state_dict(), CFG))


def test_import_single_group_adamw_registration_order():
    """Plain AdamW(model.parameters()) — ONE group whose positions are
    registration order, not the finetuner's decay-reordered split. The
    position→name map must switch accordingly (weight_decay=0 so the
    group-split semantics don't enter; this pins the ORDER)."""
    model = _hf_model()
    opt_t = torch.optim.AdamW(model.parameters(), lr=HP["lr"],
                              betas=HP["betas"], eps=HP["eps"],
                              weight_decay=0.0)
    for s in range(30, 33):
        _torch_step(model, opt_t, _grads(model, s))

    params = params_from_hf_state_dict(
        {k: v.clone() for k, v in model.state_dict().items()}, CFG)
    imported = interop.adamw_state_from_reference(opt_t.state_dict(), CFG)
    assert int(imported.count) == 3

    tc = TrainConfig(optimizer_type="adamw", lr=HP["lr"], betas=HP["betas"],
                     eps=HP["eps"], weight_decay=0.0, max_grad_norm=0.0)
    opt_j = make_optimizer(tc, params)
    state = interop.replace_scale_by_adam(opt_j.init(params), imported)
    for s in range(33, 35):
        g = _grads(model, s)
        gt = params_from_hf_state_dict(g, CFG)
        upd, state = opt_j.update(gt, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, upd)
        _torch_step(model, opt_t, g)

    _assert_tree_close(params, params_from_hf_state_dict(
        model.state_dict(), CFG))


def test_hf_named_parameter_order_asymmetric_towers():
    """Order generation must track each tower's own depth — pinned on a
    config with DIFFERENT text/vision layer counts (catches swapped or
    shared-depth assumptions the symmetric tiny config would hide)."""
    from dataclasses import replace

    transformers = pytest.importorskip("transformers")
    cfg = replace(CFG, text=replace(CFG.text, num_layers=1),
                  vision=replace(CFG.vision, num_layers=3))
    hf_cfg = transformers.CLIPConfig(
        projection_dim=cfg.projection_dim,
        text_config=dict(
            vocab_size=cfg.text.vocab_size,
            hidden_size=cfg.text.hidden_size,
            intermediate_size=cfg.text.intermediate_size,
            num_hidden_layers=cfg.text.num_layers,
            num_attention_heads=cfg.text.num_heads,
            max_position_embeddings=cfg.text.max_position_embeddings),
        vision_config=dict(
            image_size=cfg.vision.image_size,
            patch_size=cfg.vision.patch_size,
            hidden_size=cfg.vision.hidden_size,
            intermediate_size=cfg.vision.intermediate_size,
            num_hidden_layers=cfg.vision.num_layers,
            num_attention_heads=cfg.vision.num_heads))
    model = transformers.CLIPModel(hf_cfg)
    assert interop.hf_named_parameter_order(cfg) == \
        [n for n, _ in model.named_parameters()]
