"""JAX param-pytree → HF torch-checkpoint conversion (inverse of hf_import).

Closes the interop loop: ``hf_import.py`` lets reference/HF checkpoints
drop into this framework; this module lets checkpoints trained here drop
back into the reference stack — ``CLIPModel.load_state_dict`` and the
reference's torch-pickle training-checkpoint loader
(``/root/reference/finetune/finetuner.py:225-273``) and evaluators
(non-strict loads, ``count-bench/cb_eval.py:53-61``) consume the output
directly. Round-trip pinned in ``tests/test_hf_export.py``.

The state-dict side is pure numpy; torch is only imported by
``save_reference_checkpoint`` (torch-CPU is baked into this image).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax
import numpy as np

from ..config import CLIPConfig


def _np(x) -> np.ndarray:
    return np.asarray(jax.device_get(x), dtype=np.float32)


def _linear_out(sd, prefix: str, p: Mapping[str, Any]) -> None:
    sd[prefix + ".weight"] = _np(p["kernel"]).T     # torch stores [out, in]
    if "bias" in p:
        sd[prefix + ".bias"] = _np(p["bias"])


def _layernorm_out(sd, prefix: str, p: Mapping[str, Any]) -> None:
    sd[prefix + ".weight"] = _np(p["scale"])
    sd[prefix + ".bias"] = _np(p["bias"])


def _encoder_layers_out(sd, prefix: str, layers) -> None:
    """Stacked [L, ...] leaves (or an unstacked tuple) → per-layer HF names."""
    for i, lp in enumerate(_per_layer(layers)):
        pre = f"{prefix}.layers.{i}"
        _layernorm_out(sd, f"{pre}.layer_norm1", lp["ln1"])
        _linear_out(sd, f"{pre}.self_attn.q_proj", lp["q"])
        _linear_out(sd, f"{pre}.self_attn.k_proj", lp["k"])
        _linear_out(sd, f"{pre}.self_attn.v_proj", lp["v"])
        _linear_out(sd, f"{pre}.self_attn.out_proj", lp["out"])
        _layernorm_out(sd, f"{pre}.layer_norm2", lp["ln2"])
        _linear_out(sd, f"{pre}.mlp.fc1", lp["fc1"])
        _linear_out(sd, f"{pre}.mlp.fc2", lp["fc2"])


def hf_state_dict_from_params(params: Mapping[str, Any],
                              cfg: CLIPConfig) -> Dict[str, np.ndarray]:
    """Our param pytree → HF ``CLIPModel`` state-dict names (numpy values).

    Exact inverse of ``hf_import.params_from_hf_state_dict`` for every
    weight both models carry. (HF's ``position_ids`` buffers are omitted —
    they are constant ``arange`` buffers ``load_state_dict`` regenerates;
    the reference's evaluators load non-strict anyway.)
    """
    sd: Dict[str, np.ndarray] = {}
    v, t = params["vision"], params["text"]

    ps = cfg.vision.patch_size
    # matmul kernel [ps*ps*3, D] → torch conv [D, 3, ps, ps]; inverse of
    # the (row, col, channel) flattening in hf_import.py:71-75.
    kernel = _np(v["patch_embedding"]["kernel"])
    sd["vision_model.embeddings.patch_embedding.weight"] = (
        kernel.reshape(ps, ps, 3, -1).transpose(3, 2, 0, 1))
    sd["vision_model.embeddings.class_embedding"] = _np(v["class_embedding"])
    sd["vision_model.embeddings.position_embedding.weight"] = _np(
        v["position_embedding"])
    _layernorm_out(sd, "vision_model.pre_layrnorm", v["pre_layernorm"])
    _layernorm_out(sd, "vision_model.post_layernorm", v["post_layernorm"])
    _encoder_layers_out(sd, "vision_model.encoder", v["layers"])

    sd["text_model.embeddings.token_embedding.weight"] = _np(
        t["token_embedding"])
    sd["text_model.embeddings.position_embedding.weight"] = _np(
        t["position_embedding"])
    _layernorm_out(sd, "text_model.final_layer_norm", t["final_layernorm"])
    _encoder_layers_out(sd, "text_model.encoder", t["layers"])

    _linear_out(sd, "visual_projection", params["visual_projection"])
    _linear_out(sd, "text_projection", params["text_projection"])
    sd["logit_scale"] = _np(params["logit_scale"]).reshape(())
    return sd


def _per_layer(layers):
    if isinstance(layers, (list, tuple)):
        return list(layers)
    num = jax.tree.leaves(layers)[0].shape[0]
    return [jax.tree.map(lambda x, i=i: x[i], layers) for i in range(num)]


def openai_state_dict_from_params(params: Mapping[str, Any],
                                  cfg: CLIPConfig) -> Dict[str, np.ndarray]:
    """Our param pytree → OpenAI ``clip`` package state-dict names — the
    format the reference's count trainer loads on resume
    (``/root/reference/finetune/count_finetuner.py:223-234`` expects
    ``clip.load("ViT-B/32")`` names). Inverse of
    ``hf_import.params_from_openai_state_dict``; q/k/v re-fuse into
    ``attn.in_proj_*``, projections stay un-transposed ``x @ proj``
    matrices. (The ``attn_mask``/dtype buffers the clip package
    regenerates are omitted — its ``load_state_dict`` tolerates that
    with ``strict=False``; ``build_model`` infers the architecture from
    the shapes emitted here.)"""
    sd: Dict[str, np.ndarray] = {}
    v, t = params["vision"], params["text"]

    ps = cfg.vision.patch_size
    kernel = _np(v["patch_embedding"]["kernel"])
    sd["visual.conv1.weight"] = kernel.reshape(ps, ps, 3, -1
                                               ).transpose(3, 2, 0, 1)
    sd["visual.class_embedding"] = _np(v["class_embedding"])
    sd["visual.positional_embedding"] = _np(v["position_embedding"])
    _layernorm_out(sd, "visual.ln_pre", v["pre_layernorm"])
    _layernorm_out(sd, "visual.ln_post", v["post_layernorm"])
    sd["visual.proj"] = _np(params["visual_projection"]["kernel"])

    def blocks(prefix, layers):
        for i, lp in enumerate(_per_layer(layers)):
            pre = f"{prefix}.resblocks.{i}"
            _layernorm_out(sd, f"{pre}.ln_1", lp["ln1"])
            sd[f"{pre}.attn.in_proj_weight"] = np.concatenate(
                [_np(lp[n]["kernel"]).T for n in ("q", "k", "v")], axis=0)
            sd[f"{pre}.attn.in_proj_bias"] = np.concatenate(
                [_np(lp[n]["bias"]) for n in ("q", "k", "v")], axis=0)
            _linear_out(sd, f"{pre}.attn.out_proj", lp["out"])
            _layernorm_out(sd, f"{pre}.ln_2", lp["ln2"])
            _linear_out(sd, f"{pre}.mlp.c_fc", lp["fc1"])
            _linear_out(sd, f"{pre}.mlp.c_proj", lp["fc2"])

    blocks("visual.transformer", v["layers"])
    blocks("transformer", t["layers"])

    sd["token_embedding.weight"] = _np(t["token_embedding"])
    sd["positional_embedding"] = _np(t["position_embedding"])
    _layernorm_out(sd, "ln_final", t["final_layernorm"])
    sd["text_projection"] = _np(params["text_projection"]["kernel"])
    sd["logit_scale"] = _np(params["logit_scale"]).reshape(())
    return sd


def save_reference_checkpoint(path: str, params: Mapping[str, Any],
                              cfg: CLIPConfig, *,
                              global_step: int = 0,
                              best_loss: float = float("inf"),
                              config: Optional[dict] = None,
                              optimizer_state_dict: Optional[dict] = None,
                              fmt: str = "hf") -> None:
    """Write a torch-pickle checkpoint in the reference's training format
    (``model_state_dict`` + ``global_step`` + ``best_loss`` + ``config``,
    ``finetuner.py:256-273``) loadable by ``CLIPModel.load_state_dict``
    and every reference evaluator's ``--checkpoint`` flag. ``fmt="openai"``
    emits OpenAI clip-package names instead (the count trainer's resume
    format, ``count_finetuner.py:223-234``).

    ``optimizer_state_dict`` (a torch ``AdamSPD.state_dict()``, built by
    ``optim.interop.reference_optimizer_state_dict``) makes the file a
    COMPLETE training checkpoint: the reference's
    ``CLIPFineTuner.load_checkpoint`` restores the optimizer
    unconditionally (``finetuner.py:237``), so without it the file serves
    evaluators/weight loads but not a reference-side training resume."""
    import torch

    to_sd = openai_state_dict_from_params if fmt == "openai" \
        else hf_state_dict_from_params
    # copy: device_get arrays are non-writable; torch wants owned memory.
    sd = {k: torch.from_numpy(np.array(a, copy=True))
          for k, a in to_sd(params, cfg).items()}
    out = {
        "model_state_dict": sd,
        "global_step": int(global_step),
        "best_loss": float(best_loss),
        "config": dict(config or {}),
    }
    if optimizer_state_dict is not None:
        out["optimizer_state_dict"] = optimizer_state_dict
    torch.save(out, path)
