"""Bit-level parity of the JAX CLIP towers vs HF torch CLIPModel.

The environment has no network, so we build a *randomly initialized* torch
``CLIPModel`` from config (offline), convert its weights with
``hf_import.params_from_hf_state_dict``, and require the JAX forward to
match the torch forward to tight fp32 tolerance. This pins down every HF
semantic the reference depends on: quick-GELU, pre/post-LN placement, CLS
vs EOS pooling, causal text mask, logit_scale
(``/root/reference/finetune/finetuner.py:120-128``).
"""

import os

import numpy as np
import pytest
import torch

from transformers import CLIPConfig as HFCLIPConfig
from transformers import CLIPModel as HFCLIPModel

from clip_finegrained_alignment_tpu.config import CLIPConfig, TextConfig, VisionConfig
from clip_finegrained_alignment_tpu.models import clip as jclip
from clip_finegrained_alignment_tpu.models.hf_import import params_from_hf_state_dict

# Small-but-real topology: 2 layers, 64-dim, keeps the test fast on CPU.
CFG = CLIPConfig(
    vision=VisionConfig(image_size=64, patch_size=16, hidden_size=64,
                        intermediate_size=128, num_layers=2, num_heads=4),
    text=TextConfig(vocab_size=512, hidden_size=48, intermediate_size=96,
                    num_layers=2, num_heads=4, max_position_embeddings=24,
                    bos_token_id=510, eos_token_id=511, pad_token_id=0),
    projection_dim=32,
)


def make_hf_model() -> HFCLIPModel:
    hf_cfg = HFCLIPConfig(
        text_config={
            "vocab_size": CFG.text.vocab_size,
            "hidden_size": CFG.text.hidden_size,
            "intermediate_size": CFG.text.intermediate_size,
            "num_hidden_layers": CFG.text.num_layers,
            "num_attention_heads": CFG.text.num_heads,
            "max_position_embeddings": CFG.text.max_position_embeddings,
            "hidden_act": "quick_gelu",
            "bos_token_id": CFG.text.bos_token_id,
            "eos_token_id": CFG.text.eos_token_id,
            "pad_token_id": CFG.text.pad_token_id,
        },
        vision_config={
            "image_size": CFG.vision.image_size,
            "patch_size": CFG.vision.patch_size,
            "hidden_size": CFG.vision.hidden_size,
            "intermediate_size": CFG.vision.intermediate_size,
            "num_hidden_layers": CFG.vision.num_layers,
            "num_attention_heads": CFG.vision.num_heads,
            "hidden_act": "quick_gelu",
        },
        projection_dim=CFG.projection_dim,
    )
    torch.manual_seed(0)
    model = HFCLIPModel(hf_cfg).eval()
    model = model.float()
    return model


@pytest.fixture(scope="module")
def models():
    hf = make_hf_model()
    params = params_from_hf_state_dict(hf.state_dict(), CFG)
    return hf, params


@pytest.fixture(scope="module")
def batch(rng=None):
    g = np.random.default_rng(7)
    B = 3
    pixels = g.standard_normal(
        (B, CFG.vision.image_size, CFG.vision.image_size, 3)).astype(np.float32)
    T = CFG.text.max_position_embeddings
    ids = g.integers(2, CFG.text.vocab_size - 2, (B, T)).astype(np.int32)
    # Realistic CLIP layout: BOS ... EOS PAD PAD
    lengths = [T, T - 4, 5]
    for i, L in enumerate(lengths):
        ids[i, 0] = CFG.text.bos_token_id
        ids[i, L - 1] = CFG.text.eos_token_id
        ids[i, L:] = CFG.text.pad_token_id
    return pixels, ids


def _torch_forward(hf, pixels_nhwc, ids):
    with torch.no_grad():
        return hf(
            pixel_values=torch.from_numpy(pixels_nhwc.transpose(0, 3, 1, 2)),
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            output_hidden_states=False,
        )


def test_full_forward_parity(models, batch):
    hf, params = models
    pixels, ids = batch
    out_t = _torch_forward(hf, pixels, ids)
    out_j = jclip.clip_forward(params, pixels, ids, CFG)

    np.testing.assert_allclose(
        np.asarray(out_j.image_embeds), out_t.image_embeds.numpy(),
        rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out_j.text_embeds), out_t.text_embeds.numpy(),
        rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out_j.logits_per_image), out_t.logits_per_image.numpy(),
        rtol=2e-4, atol=2e-4)


def test_hidden_state_parity(models, batch):
    """SPARC consumes last_hidden_state of both towers
    (``finetuner.py:125-128``) — they must match, including the vision
    tower's *pre-post-layernorm* convention."""
    hf, params = models
    pixels, ids = batch
    out_t = _torch_forward(hf, pixels, ids)
    out_j = jclip.clip_forward(params, pixels, ids, CFG)

    np.testing.assert_allclose(
        np.asarray(out_j.vision_last_hidden_state),
        out_t.vision_model_output.last_hidden_state.numpy(),
        rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out_j.text_last_hidden_state),
        out_t.text_model_output.last_hidden_state.numpy(),
        rtol=2e-5, atol=2e-5)


def test_encode_single_towers(models, batch):
    hf, params = models
    pixels, ids = batch
    with torch.no_grad():
        img_t = hf.get_image_features(
            torch.from_numpy(pixels.transpose(0, 3, 1, 2))).numpy()
        txt_t = hf.get_text_features(
            torch.from_numpy(ids.astype(np.int64))).numpy()
    img_j = np.asarray(jclip.encode_image(params, pixels, CFG))
    txt_j = np.asarray(jclip.encode_text(params, ids, CFG))
    np.testing.assert_allclose(img_j, img_t, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(txt_j, txt_t, rtol=2e-5, atol=2e-5)


def test_attention_mask_parity(models, batch):
    """Eval paths pass processor attention masks
    (``cb_eval.py:247-258``); padding bias must match torch."""
    hf, params = models
    pixels, ids = batch
    mask = (ids != CFG.text.pad_token_id).astype(np.int32)
    with torch.no_grad():
        out_t = hf(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2)),
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)))
    out_j = jclip.clip_forward(params, pixels, ids, CFG, attention_mask=mask)
    np.testing.assert_allclose(
        np.asarray(out_j.logits_per_image), out_t.logits_per_image.numpy(),
        rtol=2e-4, atol=2e-4)


def test_bf16_forward_close(models, batch):
    """bf16 compute should stay within bf16-grade tolerance of fp32."""
    import jax.numpy as jnp
    hf, params = models
    pixels, ids = batch
    out32 = jclip.clip_forward(params, pixels, ids, CFG)
    out16 = jclip.clip_forward(params, pixels, ids, CFG, dtype=jnp.bfloat16)
    i32 = np.asarray(out32.image_embeds)
    i16 = np.asarray(out16.image_embeds, dtype=np.float32)
    # cosine similarity of embeddings must survive bf16
    cos = (i32 * i16).sum(-1) / (
        np.linalg.norm(i32, axis=-1) * np.linalg.norm(i16, axis=-1) + 1e-8)
    assert cos.min() > 0.99, f"bf16 drifted: min cos={cos.min()}"


@pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1",
                    reason="full-size parity is minutes on CPU; RUN_SLOW=1")
def test_full_vit_b32_parity_slow():
    """Production-topology parity: full ViT-B/32 random-init torch CLIPModel
    vs our JAX forward, tight fp32 tolerance."""
    import jax
    import jax.numpy as jnp

    full = CLIPConfig()  # ViT-B/32 defaults
    hf_cfg = HFCLIPConfig(
        text_config={"hidden_act": "quick_gelu"},
        vision_config={"hidden_act": "quick_gelu"},
    )
    torch.manual_seed(1)
    model = HFCLIPModel(hf_cfg).eval()
    params = params_from_hf_state_dict(model.state_dict(), full)

    g = np.random.default_rng(7)
    px = g.normal(size=(2, 224, 224, 3)).astype(np.float32)
    ids = g.integers(1, 49000, size=(2, 77)).astype(np.int64)
    ids[:, 0] = 49406
    ids[:, -1] = 49407

    with torch.no_grad():
        ref = model(pixel_values=torch.from_numpy(
            px.transpose(0, 3, 1, 2)), input_ids=torch.from_numpy(ids))
    out = jclip.clip_forward(params, jnp.asarray(px),
                             jnp.asarray(ids.astype(np.int32)), full)
    np.testing.assert_allclose(
        np.asarray(out.logits_per_image),
        ref.logits_per_image.numpy(), rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize("name,vit_layers,proj", [
    ("ViT-B/32", 12, 512), ("ViT-B/16", 12, 512), ("ViT-L/14", 24, 768)])
def test_model_family_shapes(name, vit_layers, proj):
    """All three reference model families (finetuner.py:296 trains B/32;
    vlms-are-blind/launch_eval.sh evals L/14) init and trace correctly."""
    import jax
    import jax.numpy as jnp

    cfg = CLIPConfig.from_name(name)
    assert cfg.vision.num_layers == vit_layers
    assert cfg.projection_dim == proj
    params = jax.eval_shape(
        lambda k: __import__(
            "clip_finegrained_alignment_tpu.models.clip",
            fromlist=["clip"]).init_clip_params(k, cfg),
        jax.random.key(0))
    assert params["visual_projection"]["kernel"].shape == \
        (cfg.vision.hidden_size, proj)
    # full forward traces with the right output shapes (no FLOPs spent)
    B = 2
    out = jax.eval_shape(
        lambda p, px, ids: jclip.clip_forward(p, px, ids, cfg),
        params,
        jax.ShapeDtypeStruct((B, cfg.vision.image_size,
                              cfg.vision.image_size, 3), np.float32),
        jax.ShapeDtypeStruct((B, 77), np.int32))
    assert out.logits_per_image.shape == (B, B)
    assert out.vision_last_hidden_state.shape == \
        (B, cfg.vision.seq_len, cfg.vision.hidden_size)
