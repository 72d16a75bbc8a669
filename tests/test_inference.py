"""Serving front-end tests: bucketing correctness, classifier shapes."""

import jax
import numpy as np

from clip_finegrained_alignment_tpu.config import CLIPConfig
from clip_finegrained_alignment_tpu.data.tokenizer import HashTokenizer
from clip_finegrained_alignment_tpu.models import clip as m
from clip_finegrained_alignment_tpu.models.inference import (
    CLIPInference, ZeroShotClassifier)

CFG = CLIPConfig.tiny_test()


def make(params=None, bucket=4):
    params = params or m.init_clip_params(jax.random.key(0), CFG)
    return CLIPInference(params, CFG, dtype=np.float32,
                         batch_bucket=bucket)


def test_bucketed_embedding_matches_direct(rng):
    inf = make(bucket=4)
    px = rng.integers(0, 256, size=(10, 32, 32, 3),
                      dtype=np.uint8)  # ragged vs bucket 4
    out = inf.embed_images(px)
    assert out.shape == (10, CFG.projection_dim)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0,
                               atol=1e-5)
    # bucketing must not change results
    inf1 = make(bucket=10)
    np.testing.assert_allclose(out, inf1.embed_images(px),
                               rtol=1e-5, atol=1e-6)


def test_zero_shot_classifier(rng):
    inf = make(bucket=4)
    tok = HashTokenizer(vocab_size=CFG.text.vocab_size)
    clf = ZeroShotClassifier(inf, ["a red circle", "a blue square",
                                   "a green triangle"], tokenizer=tok)
    assert clf.text_features.shape == (3, CFG.projection_dim)
    px = rng.integers(0, 256, size=(5, 32, 32, 3), dtype=np.uint8)
    pred, probs = clf.predict(px)
    assert pred.shape == (5,) and probs.shape == (5, 3)
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-5)
