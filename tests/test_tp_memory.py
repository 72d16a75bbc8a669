"""Tensor-parallel memory-scaling evidence (VERDICT round-1 item 8).

The TP axis exists for models whose params + AdamSPD state (4 fp32
buffers: params, anchors, mu, nu) outgrow one chip's HBM (ViT-L/14:
~430M params → ~6.9 GB of state before activations, BASELINE.md). This
test pins the property that makes TP useful: per-device bytes of params
AND optimizer state drop ~linearly in the model-axis size, because optax
state is initialized as zeros_like/copies of the sharded params and
therefore inherits their layout.
"""

import jax
import numpy as np
import pytest

from clip_finegrained_alignment_tpu.config import (CLIPConfig, MeshConfig,
                                                   TextConfig, TrainConfig,
                                                   VisionConfig)
from clip_finegrained_alignment_tpu.models import clip as m
from clip_finegrained_alignment_tpu.optim.factory import make_optimizer
from clip_finegrained_alignment_tpu.parallel import mesh as pmesh
from clip_finegrained_alignment_tpu.parallel.sharding_rules import \
    shard_params

# Mid-size config: big enough that the sharded matmul weights dominate
# embeddings/LN scalars, small enough for the 1-core CPU host.
CFG = CLIPConfig(
    vision=VisionConfig(image_size=64, patch_size=16, hidden_size=256,
                        intermediate_size=1024, num_layers=4, num_heads=4),
    text=TextConfig(vocab_size=512, hidden_size=256, intermediate_size=1024,
                    num_layers=4, num_heads=4, max_position_embeddings=16,
                    bos_token_id=510, eos_token_id=511, pad_token_id=0),
    projection_dim=128,
)


def _device0_bytes(tree) -> int:
    total = 0
    for leaf in jax.tree.leaves(tree):
        if isinstance(leaf, jax.Array) and leaf.addressable_shards:
            shard = leaf.addressable_shards[0]
            total += int(np.prod(shard.data.shape)) * leaf.dtype.itemsize
    return total


def _layout_bytes(tp: int, eight_devices):
    mesh = pmesh.make_mesh(MeshConfig(data=1, model=tp),
                           eight_devices[:tp])
    params = m.init_clip_params(jax.random.key(0), CFG)
    sharded = shard_params(params, mesh) if tp > 1 \
        else pmesh.replicate(params, mesh)
    cfg = TrainConfig(clip_model="tiny", optimizer_type="adamspd",
                      batch_size=2, gradient_accumulation_steps=1)
    anchor = jax.tree.map(lambda x: x.copy(), sharded)
    opt = make_optimizer(cfg, sharded, anchor_params=anchor)
    opt_state = opt.init(sharded)
    return _device0_bytes(sharded), _device0_bytes(opt_state)


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_shrinks_per_device_state(tp, eight_devices):
    p1, o1 = _layout_bytes(1, eight_devices)
    pt, ot = _layout_bytes(tp, eight_devices)
    # Matmul weights dominate this config; LN/embeddings stay replicated,
    # so expect per-device bytes well under the replicated footprint and
    # approaching 1/tp as tp grows.
    assert pt < p1 * (1.0 / tp + 0.35), (pt, p1)
    assert ot < o1 * (1.0 / tp + 0.35), (ot, o1)
    # Optimizer state (mu, nu, anchors) must inherit the param layout:
    # same scaling ratio within a few percent.
    assert abs(pt / p1 - ot / o1) < 0.1
