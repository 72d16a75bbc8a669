"""Evaluation-suite tests on tiny models + procedural fixtures (the test
pyramid the reference lacks, SURVEY.md §4(d))."""

import os

import jax
import numpy as np
import pytest

from clip_finegrained_alignment_tpu.config import CLIPConfig
from clip_finegrained_alignment_tpu.data.tokenizer import HashTokenizer
from clip_finegrained_alignment_tpu.eval import (
    CountBenchEvaluator, CropDetectionEvaluator, ProceduralObjectSource,
    VLMsBlindEvaluator, crop_to_target_ratio, evaluate_batch,
    extract_number, generate_templates, pad_templates,
    thresholded_decision, white_square_image)
from clip_finegrained_alignment_tpu.eval.vlmsblind import (
    TASKS, negative_templates, positive_templates, validate_groundtruth)
from clip_finegrained_alignment_tpu.models import clip as m

CFG = CLIPConfig.tiny_test()
TOK = HashTokenizer(vocab_size=CFG.text.vocab_size)


@pytest.fixture(scope="module")
def params():
    return m.init_clip_params(jax.random.key(0), CFG)


def rand_image(rng, s=48):
    return rng.integers(0, 256, size=(s, s, 3), dtype=np.uint8)


# ---------------------------------------------------------------------------
# Template generation (cb_eval parity)
# ---------------------------------------------------------------------------

def test_generate_templates_word_format():
    pos, neg = generate_templates("A photo of 3 cats", 3, "word")
    assert pos == ["A photo of three cats"]
    # negatives: 1, 2, 4, 5 as words
    assert neg == ["A photo of one cats", "A photo of two cats",
                   "A photo of four cats", "A photo of five cats"]


def test_generate_templates_both_and_edges():
    pos, neg = generate_templates("two dogs playing", 2, "both")
    assert pos == ["2 dogs playing", "two dogs playing"]
    # nearby = [1, 3, 4] (0 invalid); both formats each
    assert len(neg) == 6
    pos12, neg12 = generate_templates("twelve birds", 12, "word")
    # nearby = [10, 11] only (13, 14 out of range)
    assert len(neg12) == 2


def test_extract_number_first_word_priority():
    assert extract_number("A photo of five dogs and 3 cats") == 5
    assert extract_number("seventeen things") == 17  # word table to 20
    assert extract_number("13 things") is None      # digits only 1-12
    assert extract_number("no numbers") is None


def test_thresholded_decision_rule():
    probs = np.array([[0.6, 0.3, 0.1], [0.3, 0.6, 0.1]])
    pos = np.array([[1.0, 0, 0], [1.0, 0, 0]])
    valid = np.ones((2, 3), np.float32)
    d = thresholded_decision(probs, pos, valid, confidence=0.5, margin=0.05)
    assert d["correct"][0] and not d["correct"][1]
    # margin failure: pos=0.5 vs neg=0.48 with margin 0.05
    probs2 = np.array([[0.52, 0.48, 0.0]])
    d2 = thresholded_decision(probs2, pos[:1], valid[:1], 0.2, 0.05)
    assert not d2["correct"][0]


def test_pad_templates_masks():
    ids = [np.ones((2, 8), np.int32), np.ones((5, 8), np.int32)]
    out_ids, valid, pos = pad_templates(ids, [[0], [1, 2]], 6, 8)
    assert out_ids.shape == (2, 6, 8)
    assert valid[0].sum() == 2 and valid[1].sum() == 5
    assert pos[0, 0] == 1 and pos[1, 1] == 1 and pos[1, 2] == 1


# ---------------------------------------------------------------------------
# CountBench evaluator end-to-end (tiny model, random images)
# ---------------------------------------------------------------------------

def test_countbench_evaluator_runs(params, rng, tmp_path):
    ev = CountBenchEvaluator(params, CFG, tokenizer=TOK, batch_size=4,
                             number_format="word")
    samples = [{"image": rand_image(rng), "text": f"A photo of {n} cats",
                "number": n} for n in [1, 2, 3, 4, 5, 13, 2]]
    samples.append({"image": None, "text": "A photo of 2 cats",
                    "number": 2})  # skipped
    results = ev.evaluate_dataset(samples)
    # 13 out of range + None image are skipped -> 6 scored
    assert len(results["correct"]) == 6
    metrics = ev.compute_metrics(results)
    assert 0.0 <= metrics["accuracy"] <= 1.0
    assert metrics["total_samples"] == 6
    assert set(metrics["per_number_accuracy"]) <= set(range(1, 13))
    ev.save_results(results, metrics, str(tmp_path))
    assert os.path.exists(tmp_path / "countbench_results.npy")
    assert os.path.exists(tmp_path / "countbench_metrics.json")


def test_template_scorer_pad_to_batch(params, rng):
    """The final partial flush pads to the fixed batch shape so it reuses
    the one compiled program (no second ~6-min TPU trace), and the padded
    rows change nothing."""
    from clip_finegrained_alignment_tpu.eval import TemplateScorer
    px = np.stack([rand_image(rng, CFG.vision.image_size)
                   for _ in range(3)]).astype(np.float32) / 255.0
    T = CFG.text.max_position_embeddings
    ids = rng.integers(1, CFG.text.vocab_size, size=(3, 5, T)).astype(np.int32)
    mask = np.ones((3, 5), np.float32)
    mask[0, 4] = 0.0
    plain = TemplateScorer(params, CFG)
    padded = TemplateScorer(params, CFG, pad_to_batch=8)
    p_ref = plain(px, ids, mask)
    p_pad = padded(px, ids, mask)
    assert p_pad.shape == (3, 5)
    np.testing.assert_allclose(p_pad, p_ref, rtol=1e-6, atol=1e-6)
    # full batch (B == pad_to_batch) and partial batch share one trace
    px8 = np.concatenate([px, px, px[:2]])
    ids8 = np.concatenate([ids, ids, ids[:2]])
    mask8 = np.concatenate([mask, mask, mask[:2]])
    padded(px8, ids8, mask8)
    cache_size = getattr(padded._score, "_cache_size", None)
    if cache_size is not None:
        assert cache_size() == 1


def test_countbench_random_arrangement_consistency(params, rng):
    """Random template arrangement must not change which slot is marked
    positive vs which template it holds."""
    ev = CountBenchEvaluator(params, CFG, tokenizer=TOK, batch_size=2,
                             template_position="random", seed=5)
    prep = ev._prepare_sample("A photo of 3 cats", 3)
    templates, pos_idx = prep
    assert [templates[i] for i in pos_idx] == ["A photo of three cats"]


# ---------------------------------------------------------------------------
# VLMs-are-Blind
# ---------------------------------------------------------------------------

def test_vlmsblind_templates_and_validation():
    assert validate_groundtruth("Touching Circles", "Yes")
    assert not validate_groundtruth("Touching Circles", "maybe")
    assert validate_groundtruth("Nested Squares", "3")
    assert not validate_groundtruth("Nested Squares", "9")
    assert validate_groundtruth("Counting Grid - Blank Grids", "4,5")
    assert validate_groundtruth("Counting Grid - Word Grids", "4x5")
    assert not validate_groundtruth("Counting Grid - Blank Grids", "2,5")
    assert validate_groundtruth("Circled Letter", "q")
    assert not validate_groundtruth("Circled Letter", "f")  # excluded

    for task in TASKS:
        gt = {"Touching Circles": "yes", "Circled Letter": "a",
              "Line Plot Intersections": "2", "Subway Connections": "1",
              "Nested Squares": "3",
              "Olympic Counting - Circles": "5",
              "Olympic Counting - Pentagons": "7",
              "Counting Grid - Blank Grids": "4,4",
              "Counting Grid - Word Grids": "5x5"}[task]
        pos = positive_templates(task, gt)
        neg = negative_templates(task, gt)
        assert len(pos) == 4
        assert 1 <= len(neg) <= 6


def test_vlmsblind_evaluator_runs(params, rng, tmp_path):
    ev = VLMsBlindEvaluator(params, CFG, tokenizer=TOK, batch_size=4)
    samples = []
    for i in range(3):
        samples.append({"image": rand_image(rng),
                        "task": "Nested Squares", "groundtruth": "3"})
    samples.append({"image": rand_image(rng),
                    "task": "Nested Squares", "groundtruth": "9"})  # invalid
    samples.append({"image": rand_image(rng),
                    "task": "Touching Circles", "groundtruth": "yes"})
    results = ev.evaluate_task(samples, "Nested Squares")
    assert len(results["correct"]) == 4  # invalid counted incorrect
    assert results["pred_templates"][3] == "Invalid input"
    metrics = ev.compute_metrics(results)
    assert metrics["total_samples"] == 4

    all_metrics = ev.run_all_tasks(samples, output_dir=str(tmp_path),
                                   tasks=["Nested Squares",
                                          "Touching Circles"])
    assert "Nested Squares" in all_metrics
    assert os.path.exists(tmp_path / "vlmsblind_metrics.json")


# ---------------------------------------------------------------------------
# Crop detection
# ---------------------------------------------------------------------------

def test_crop_to_target_ratio_geometry():
    img = np.zeros((400, 400, 3), np.uint8)
    bbox = [190, 190, 20, 20]  # 400 px² object, 0.25% of frame
    crop, new_bbox = crop_to_target_ratio(img, bbox, 0.05)
    h, w = crop.shape[:2]
    ratio = (bbox[2] * bbox[3]) / (h * w)
    assert abs(ratio - 0.05) < 0.01
    assert new_bbox[2:] == [20, 20]


def test_crop_detection_evaluator(params):
    src = ProceduralObjectSource(image_size=256, seed=1)
    ev = CropDetectionEvaluator(params, CFG, tokenizer=TOK)
    out = ev.run_evaluation(src, num_samples=2)
    stats = out["aggregate_stats"]
    assert set(stats) == {"original_positive", "original_negative",
                          "crop_05_positive", "crop_05_negative",
                          "crop_10_positive", "crop_10_negative"}
    for s in stats.values():
        assert 0.0 <= s["accuracy"] <= 1.0
        assert 0.0 <= s["avg_positive"] <= 1.0


def test_white_square_sanity(params):
    ev = CropDetectionEvaluator(params, CFG, tokenizer=TOK,
                                use_white_square=True)
    r = ev.evaluate_sample(white_square_image(), [50, 50, 50, 50],
                           "red circle", "blue square")
    assert set(r) == {"original_positive", "original_negative",
                      "crop_05_positive", "crop_05_negative",
                      "crop_10_positive", "crop_10_negative"}


# ---------------------------------------------------------------------------
# Train-time batch eval
# ---------------------------------------------------------------------------

def test_evaluate_batch(params, rng, tmp_path):
    B, T = 4, CFG.text.max_position_embeddings
    ids = rng.integers(1, 200, size=(B, T)).astype(np.int32)
    ids[:, -1] = CFG.text.eos_token_id
    cf = rng.integers(1, 200, size=(B, 9, T)).astype(np.int32)
    cf[..., -1] = CFG.text.eos_token_id
    counts = np.array([1, 3, 5, 10], np.int32)
    cf_counts = np.stack([
        [c for c in range(1, 11) if c != g] for g in counts]).astype(np.int32)
    batch = {
        "pixel_values": rng.integers(
            0, 256, size=(B, 32, 32, 3), dtype=np.uint8),
        "input_ids": ids, "cf_input_ids": cf,
        "count": counts, "cf_counts": cf_counts,
    }
    png = str(tmp_path / "confusion.png")
    acc, confusion, results = evaluate_batch(params, CFG, batch,
                                             filename=png)
    assert confusion.shape == (10, 10)
    # each sampled row is a probability distribution
    for g in counts:
        np.testing.assert_allclose(confusion[g - 1].sum(), 1.0, atol=1e-5)
    assert 0.0 <= acc <= 1.0
    assert os.path.exists(png)
    assert len(results) == B


def test_crop_detection_debug_dir(params, tmp_path):
    """--debug-dir parity (crop_eval.py:175-227): per-sample dirs with the
    three positive-condition bbox overlays."""
    src = ProceduralObjectSource(image_size=256, seed=3)
    ev = CropDetectionEvaluator(params, CFG, tokenizer=TOK)
    dbg = str(tmp_path / "dbg")
    ev.run_evaluation(src, num_samples=2, debug_dir=dbg)
    sample_dirs = sorted(os.listdir(dbg))
    assert len(sample_dirs) == 2
    for d in sample_dirs:
        files = set(os.listdir(os.path.join(dbg, d)))
        assert files == {"original_positive.png", "crop_5_positive.png",
                         "crop_10_positive.png"}
        for f in files:
            assert os.path.getsize(os.path.join(dbg, d, f)) > 0


def test_crop_detection_batched_equals_serial(params):
    """The chunked scorer path (round 3: one [6*chunk, 2] forward per
    chunk) must produce the same per-sample results as the serial
    per-sample path, including the padded last partial chunk."""
    ev = CropDetectionEvaluator(params, CFG, tokenizer=TOK, batch_size=12)
    # 3 samples with chunk=2 -> one full flush + one padded flush.
    out_b = ev.run_evaluation(ProceduralObjectSource(image_size=256,
                                                     seed=7),
                              num_samples=3)
    serial_src = ProceduralObjectSource(image_size=256, seed=7)
    for rb in out_b["individual_results"]:
        image, bbox, tn, fn = serial_src.sample()
        rs = ev.evaluate_sample(image, bbox, tn, fn)
        assert rb["category"] == tn
        for cond in rs:
            np.testing.assert_allclose(
                rb[cond]["positive_score"], rs[cond]["positive_score"],
                rtol=2e-5, atol=2e-6)
            assert rb[cond]["correct"] == rs[cond]["correct"]


# ---------------------------------------------------------------------------
# Mesh-sharded eval: data-parallel over the virtual 8-device mesh
# ---------------------------------------------------------------------------

def test_template_scorer_mesh_matches_single_device(params, rng,
                                                    eight_devices):
    """The shared scorer with a mesh (batch sharded over ``data``, params
    replicated) must reproduce the single-device probabilities exactly —
    including a short batch that pads to the compiled shape."""
    from clip_finegrained_alignment_tpu.config import MeshConfig
    from clip_finegrained_alignment_tpu.eval.scoring import TemplateScorer
    from clip_finegrained_alignment_tpu.parallel import mesh as pmesh

    S = CFG.vision.image_size
    T = CFG.text.max_position_embeddings
    NT = 5
    mesh = pmesh.make_mesh(MeshConfig(data=8), eight_devices)
    single = TemplateScorer(params, CFG, pad_to_batch=16)
    sharded = TemplateScorer(params, CFG, pad_to_batch=16, mesh=mesh)

    for B in (16, 9):  # full batch + short batch (pad + slice path)
        px = rng.normal(size=(B, S, S, 3)).astype(np.float32)
        ids = rng.integers(0, CFG.text.vocab_size,
                           size=(B, NT, T)).astype(np.int32)
        mask = (rng.random((B, NT)) < 0.7).astype(np.float32)
        mask[:, 0] = 1.0  # at least one valid template per sample
        p1 = single(px, ids, mask)
        p2 = sharded(px, ids, mask)
        assert p2.shape == (B, NT)
        np.testing.assert_allclose(p1, p2, rtol=1e-5, atol=1e-7)


def test_template_scorer_mesh_requires_divisible_pad(params,
                                                     eight_devices):
    from clip_finegrained_alignment_tpu.config import MeshConfig
    from clip_finegrained_alignment_tpu.eval.scoring import TemplateScorer
    from clip_finegrained_alignment_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh(MeshConfig(data=8), eight_devices)
    for bad_pad in (None, 12):
        with pytest.raises(ValueError, match="divisible"):
            TemplateScorer(params, CFG, pad_to_batch=bad_pad, mesh=mesh)


def test_countbench_mesh_matches_single_device(params, rng, eight_devices):
    """CountBench end-to-end with the evaluator on the mesh: identical
    metrics to the single-device run (same samples, same seed)."""
    from clip_finegrained_alignment_tpu.config import MeshConfig
    from clip_finegrained_alignment_tpu.parallel import mesh as pmesh

    samples = [{"image": rand_image(rng), "text": f"A photo of {n} cats",
                "number": n} for n in [1, 2, 3, 4, 5, 6, 7, 2, 3, 4]]

    def run(mesh):
        ev = CountBenchEvaluator(params, CFG, tokenizer=TOK, batch_size=8,
                                 number_format="word", seed=0, mesh=mesh)
        return ev.compute_metrics(ev.evaluate_dataset(list(samples)))

    m1 = run(None)
    m2 = run(pmesh.make_mesh(MeshConfig(data=8), eight_devices))
    assert m1["total_samples"] == m2["total_samples"] == 10
    for k in ("accuracy", "argmax_accuracy", "avg_confidence"):
        np.testing.assert_allclose(m1[k], m2[k], rtol=1e-6)


def test_crop_detection_mesh_matches_single_device(params, eight_devices):
    from clip_finegrained_alignment_tpu.config import MeshConfig
    from clip_finegrained_alignment_tpu.parallel import mesh as pmesh

    def run(mesh):
        ev = CropDetectionEvaluator(params, CFG, tokenizer=TOK,
                                    batch_size=12, mesh=mesh)
        return ev.run_evaluation(
            ProceduralObjectSource(image_size=256, seed=7), num_samples=3)

    out1 = run(None)
    out2 = run(pmesh.make_mesh(MeshConfig(data=8), eight_devices))
    for r1, r2 in zip(out1["individual_results"],
                      out2["individual_results"]):
        assert r1["category"] == r2["category"]
        for cond in ("original_positive", "crop_05_positive"):
            np.testing.assert_allclose(r1[cond]["positive_score"],
                                       r2[cond]["positive_score"],
                                       rtol=2e-5, atol=2e-6)
