"""Round-trip tests for the checkpoint export path (models/hf_export.py).

Pins that export is the exact inverse of hf_import (bit-for-bit param
round-trip), that the torch-pickle container matches the reference
trainer's format (finetuner.py:256-273), and that the emitted names load
into a real HF ``CLIPModel`` with nothing unexpected.
"""

import numpy as np
import jax
import pytest

from clip_finegrained_alignment_tpu.config import CLIPConfig
from clip_finegrained_alignment_tpu.models import clip as m
from clip_finegrained_alignment_tpu.models.hf_export import (
    hf_state_dict_from_params, save_reference_checkpoint)
from clip_finegrained_alignment_tpu.models.hf_import import (
    load_reference_checkpoint, params_from_hf_state_dict)

CFG = CLIPConfig.tiny_test()


def _assert_trees_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert jax.tree.structure(a) == jax.tree.structure(b)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_export_import_roundtrip_bitexact():
    params = m.init_clip_params(jax.random.key(0), CFG)
    sd = hf_state_dict_from_params(params, CFG)
    back = params_from_hf_state_dict(sd, CFG)
    _assert_trees_equal(params, back)


def test_export_handles_unstacked_layout():
    params = m.init_clip_params(jax.random.key(1), CFG)
    sd_stacked = hf_state_dict_from_params(params, CFG)
    sd_unstacked = hf_state_dict_from_params(m.unstack_layers(params), CFG)
    assert sorted(sd_stacked) == sorted(sd_unstacked)
    for k in sd_stacked:
        np.testing.assert_array_equal(sd_stacked[k], sd_unstacked[k])


def test_reference_checkpoint_container_roundtrip(tmp_path):
    params = m.init_clip_params(jax.random.key(2), CFG)
    path = str(tmp_path / "export.pt")
    save_reference_checkpoint(path, params, CFG, global_step=123,
                              best_loss=0.5, config={"lr": 2e-5})
    back, meta = load_reference_checkpoint(path, CFG)
    _assert_trees_equal(params, back)
    assert meta["global_step"] == 123
    assert meta["best_loss"] == 0.5
    assert meta["config"] == {"lr": 2e-5}

    # The container shape is exactly what the reference trainer writes
    # (finetuner.py:256-273) and its evaluators read (cb_eval.py:53-61).
    import torch
    raw = torch.load(path, map_location="cpu", weights_only=False)
    assert set(raw) == {"model_state_dict", "global_step", "best_loss",
                        "config"}
    assert all(isinstance(v, torch.Tensor)
               for v in raw["model_state_dict"].values())


def test_exported_names_load_into_hf_clipmodel():
    """The emitted names must be exactly what CLIPModel.load_state_dict
    expects — missing keys may only be HF's constant position_ids
    buffers; no unexpected keys at all."""
    transformers = pytest.importorskip("transformers")
    import torch

    hf_cfg = transformers.CLIPConfig(
        projection_dim=CFG.projection_dim,
        text_config=dict(
            vocab_size=CFG.text.vocab_size, hidden_size=CFG.text.hidden_size,
            intermediate_size=CFG.text.intermediate_size,
            num_hidden_layers=CFG.text.num_layers,
            num_attention_heads=CFG.text.num_heads,
            max_position_embeddings=CFG.text.max_position_embeddings),
        vision_config=dict(
            image_size=CFG.vision.image_size, patch_size=CFG.vision.patch_size,
            hidden_size=CFG.vision.hidden_size,
            intermediate_size=CFG.vision.intermediate_size,
            num_hidden_layers=CFG.vision.num_layers,
            num_attention_heads=CFG.vision.num_heads))
    model = transformers.CLIPModel(hf_cfg)

    params = m.init_clip_params(jax.random.key(3), CFG)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in hf_state_dict_from_params(params, CFG).items()}
    result = model.load_state_dict(sd, strict=False)
    assert not result.unexpected_keys
    assert all(k.endswith("position_ids") for k in result.missing_keys)


# ---------------------------------------------------------------------------
# OpenAI clip-package format (the reference count trainer's checkpoints,
# count_finetuner.py:29-30,210)
# ---------------------------------------------------------------------------

def test_openai_roundtrip_bitexact():
    from clip_finegrained_alignment_tpu.models.hf_export import (
        openai_state_dict_from_params)
    from clip_finegrained_alignment_tpu.models.hf_import import (
        is_openai_state_dict, params_from_openai_state_dict)

    params = m.init_clip_params(jax.random.key(4), CFG)
    sd = openai_state_dict_from_params(params, CFG)
    assert is_openai_state_dict(sd)
    assert "visual.transformer.resblocks.0.attn.in_proj_weight" in sd
    assert sd["visual.transformer.resblocks.0.attn.in_proj_weight"].shape \
        == (3 * CFG.vision.hidden_size, CFG.vision.hidden_size)
    back = params_from_openai_state_dict(sd, CFG)
    _assert_trees_equal(params, back)


def test_openai_container_dispatch(tmp_path):
    """load_reference_checkpoint must auto-detect the OpenAI naming —
    the reference's own evaluators silently load NOTHING from these
    checkpoints (non-strict HF loads match zero keys, cb_eval.py:53-61)."""
    from clip_finegrained_alignment_tpu.models.hf_export import (
        save_reference_checkpoint)

    params = m.init_clip_params(jax.random.key(5), CFG)
    path = str(tmp_path / "count_best.pt")
    save_reference_checkpoint(path, params, CFG, global_step=7,
                              best_loss=1.5, fmt="openai")
    back, meta = load_reference_checkpoint(path, CFG)
    _assert_trees_equal(params, back)
    assert meta["global_step"] == 7


def test_openai_forward_matches_torch_multihead_packing():
    """The in_proj split must follow torch MultiheadAttention's (q, k, v)
    row packing: rebuild per-projection outputs from the fused matrix and
    compare with our per-projection linears."""
    import torch
    from clip_finegrained_alignment_tpu.models.hf_export import (
        openai_state_dict_from_params)

    params = m.init_clip_params(jax.random.key(6), CFG)
    sd = openai_state_dict_from_params(params, CFG)
    lp = jax.tree.map(lambda x: x[0], params["vision"]["layers"])
    d = CFG.vision.hidden_size
    x = np.random.default_rng(0).normal(size=(5, d)).astype(np.float32)
    w = torch.from_numpy(
        sd["visual.transformer.resblocks.0.attn.in_proj_weight"].copy())
    b = torch.from_numpy(
        sd["visual.transformer.resblocks.0.attn.in_proj_bias"].copy())
    fused = (torch.from_numpy(x) @ w.T + b).numpy()     # [5, 3D], torch order
    for i, name in enumerate(("q", "k", "v")):
        ours = x @ np.asarray(lp[name]["kernel"]) + np.asarray(lp[name]["bias"])
        np.testing.assert_allclose(fused[:, i * d:(i + 1) * d], ours,
                                   rtol=1e-5, atol=1e-5)
