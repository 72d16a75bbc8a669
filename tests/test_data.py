"""Data-layer tests: numbers, tokenizer, synthetic generator, pipeline."""

import json
import os

import numpy as np
import pytest

from clip_finegrained_alignment_tpu.data import numbers
from clip_finegrained_alignment_tpu.data.datasets import (
    CounterfactualCaptionDataset, CountingDataPipeline,
    SyntheticCaptionDataset)
from clip_finegrained_alignment_tpu.data.preprocess import (
    pad_to_square, preprocess_batch, preprocess_host)
from clip_finegrained_alignment_tpu.data.synthetic import (
    generate_procedural_dataset, pack_box, position_phrase, size_category)
from clip_finegrained_alignment_tpu.data.tokenizer import (
    CLIPTokenizer, HashTokenizer)


# ---------------------------------------------------------------------------
# numbers
# ---------------------------------------------------------------------------

def test_find_first_number_digit_vs_word_order():
    assert numbers.find_first_number("two cats and 3 dogs")[0] == 2
    assert numbers.find_first_number("3 dogs and two cats")[0] == 3
    assert numbers.find_first_number("no counts here") is None


def test_replace_first_number_formats():
    s = "A photo of seven apples"
    assert numbers.replace_first_number(s, 9) == "A photo of nine apples"
    assert numbers.replace_first_number(s, 9, "numeric") == \
        "A photo of 9 apples"


def test_count_after_with_and_counterfactuals():
    cap = "A photo of a kitchen scene with 4 cups"
    assert numbers.count_after_with(cap) == 4
    cfs = numbers.counterfactual_counts(4)
    assert len(cfs) == 9 and 4 not in cfs
    cf = numbers.counterfactual_caption(cap, 1)
    assert "with 1 cup" in cf
    cf10 = numbers.counterfactual_caption(cap, 10)
    assert "with 10 cups" in cf10


def test_counterfactual_caption_word_form():
    cap = "A photo of a table with three oranges"
    assert numbers.counterfactual_caption(cap, 1) == \
        "A photo of a table with one orange"


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

def test_hash_tokenizer_layout():
    tok = HashTokenizer()
    ids = tok(["three cats", "three cats", "four dogs"])
    assert ids.shape == (3, 77) and ids.dtype == np.int32
    assert (ids[0] == ids[1]).all() and not (ids[0] == ids[2]).all()
    assert ids[0, 0] == tok.bos_token_id
    row = ids[0]
    assert tok.eos_token_id in row
    # padding after EOS
    eos_pos = int(np.argmax(row == tok.eos_token_id))
    assert (row[eos_pos + 1:] == tok.pad_token_id).all()


def test_clip_bpe_tokenizer_with_toy_merges():
    """Exercise the real BPE machinery with a constructed merge table."""
    merges = [("c", "a"), ("ca", "t"), ("cat", "</w>"),
              ("d", "o"), ("do", "g</w>")]
    tok = CLIPTokenizer(merges)
    ids = tok.encode("cat dog")
    # 'cat' fully merges to one token + '</w>'; decode round-trips.
    assert tok.decode(ids) == "cat dog"
    full = tok(["a cat", "dog"])
    assert full.shape == (2, 77)
    assert full[0, 0] == tok.bos_token_id


# ---------------------------------------------------------------------------
# synthetic generator
# ---------------------------------------------------------------------------

def test_size_category_bands():
    assert size_category(40, 20) == "small"
    assert size_category(100, 50) == "medium"
    assert size_category(300, 10) == "large"


def test_pack_box_bitshift():
    assert pack_box([1, 2, 3, 4]) == (1 << 24) | (2 << 16) | (3 << 8) | 4


def test_position_phrase_grid():
    s = position_phrase([[0, 0, 10, 10]], "cat", 90, 90)
    assert s == "1 cat at top-left"
    s2 = position_phrase([[0, 0, 10, 10], [80, 80, 89, 89]], "cat", 90, 90)
    assert s2 == "2 cats at top-left and bottom-right"


def test_generate_procedural_dataset(tmp_path):
    anns = generate_procedural_dataset(
        str(tmp_path), num_samples=6, image_size=64, max_objects=4,
        annotation_mode="count", seed=7)
    assert len(anns) == 6
    for a in anns:
        assert os.path.exists(a["image_path"])
        assert 1 <= a["count"] <= 4
        assert f"with {a['count']} " in a["caption"]
    # determinism
    anns2 = generate_procedural_dataset(
        str(tmp_path / "again"), num_samples=6, image_size=64,
        max_objects=4, annotation_mode="count", seed=7)
    assert [a["caption"] for a in anns] == [a["caption"] for a in anns2]


def test_generate_integer_mode(tmp_path):
    anns = generate_procedural_dataset(
        str(tmp_path), num_samples=2, image_size=64, max_objects=2,
        annotation_mode="integer", seed=1, save_images=False)
    for a in anns:
        assert "box_integers" in a and len(a["box_integers"]) == a["count"]
        assert "at positions" in a["caption"]


# ---------------------------------------------------------------------------
# preprocessing
# ---------------------------------------------------------------------------

def test_pad_to_square_white():
    img = np.zeros((10, 6, 3), np.uint8)
    out = pad_to_square(img)
    assert out.shape == (10, 10, 3)
    assert (out[:, :2] == 255).all() and (out[:, 2:8] == 0).all()


def test_preprocess_batch_matches_host():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    dev = np.asarray(preprocess_batch(img[None], image_size=32))[0]
    host = preprocess_host(img, image_size=32)
    np.testing.assert_allclose(dev, host, atol=1e-5)


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth")
    generate_procedural_dataset(str(d), num_samples=12, image_size=64,
                                max_objects=3, seed=3)
    return str(d)


def test_pipeline_standard_batches(tiny_dataset_dir):
    ds = SyntheticCaptionDataset(
        os.path.join(tiny_dataset_dir, "synthetic_annotations.json"))
    assert len(ds) == 12
    pipe = CountingDataPipeline(ds, batch_size=4, image_size=64,
                                tokenizer=HashTokenizer(), seed=0)
    batches = list(pipe.epoch(0))
    assert len(batches) == 3 == pipe.steps_per_epoch()
    b = batches[0]
    assert b["pixel_values"].shape == (4, 64, 64, 3)
    assert b["pixel_values"].dtype == np.uint8
    assert b["input_ids"].shape == (4, 77)
    assert b["count"].shape == (4,)
    # different epochs shuffle differently
    b1 = next(iter(pipe.epoch(1)))
    assert not np.array_equal(b["count"], b1["count"]) or \
        not np.array_equal(b["input_ids"], b1["input_ids"])


def test_pipeline_counterfactual_batches(tiny_dataset_dir):
    ds = CounterfactualCaptionDataset(
        os.path.join(tiny_dataset_dir, "synthetic_annotations.json"))
    pipe = CountingDataPipeline(ds, batch_size=4, mode="counterfactual",
                                image_size=64, tokenizer=HashTokenizer())
    b = next(iter(pipe.epoch(0)))
    assert b["cf_input_ids"].shape == (4, 9, 77)
    assert b["cf_counts"].shape == (4, 9)
    # cf counts exclude the gt count
    for i in range(4):
        assert b["count"][i] not in b["cf_counts"][i]


def test_pipeline_host_sharding(tiny_dataset_dir):
    ds = SyntheticCaptionDataset(
        os.path.join(tiny_dataset_dir, "synthetic_annotations.json"))
    seen = []
    for pi in range(2):
        pipe = CountingDataPipeline(ds, batch_size=3, image_size=64,
                                    tokenizer=HashTokenizer(),
                                    process_index=pi, process_count=2)
        for b in pipe.epoch(0):
            seen.extend(b["input_ids"][:, 1].tolist())
    # two hosts cover the whole (shuffled) dataset without overlap
    assert len(seen) == 12


def test_end_to_end_tiny_training_from_pipeline(tiny_dataset_dir, rng):
    """The full slice: procedural data → pipeline → SPMD trainer (tiny
    model), covering the uint8 fused-normalization path."""
    from clip_finegrained_alignment_tpu.config import TrainConfig
    from clip_finegrained_alignment_tpu.train.engine import Trainer

    # 64px images with tiny model (32px): pipeline resizes on host.
    ds = SyntheticCaptionDataset(
        os.path.join(tiny_dataset_dir, "synthetic_annotations.json"))
    cfg = TrainConfig(clip_model="tiny", batch_size=4,
                      gradient_accumulation_steps=2, lr=1e-3,
                      loss_type="clip", use_amp=False, log_every=1000)
    # Tokenizer layout matched to the tiny model config (vocab 256,
    # bos 254, eos 255, pad 0).
    pipe = CountingDataPipeline(ds, batch_size=cfg.effective_batch_size,
                                image_size=32, context_length=16,
                                tokenizer=HashTokenizer(vocab_size=256))
    trainer = Trainer(cfg)
    result = trainer.train(pipe, num_epochs=2, log_fn=None)
    assert result["global_step"] == 2  # 12 samples // 8 = 1 batch/epoch
    assert np.isfinite(result["best_loss"])


# ---------------------------------------------------------------------------
# packed datasets (data/packed.py)
# ---------------------------------------------------------------------------

def test_packed_pipeline_matches_live_pipeline(tiny_dataset_dir, tmp_path):
    """Packed batches must be byte-identical to the live loader's for the
    same (seed, epoch): the pack stores the output of the same per-sample
    preprocessing, and the epoch shuffle/shard machinery is shared."""
    from clip_finegrained_alignment_tpu.data.packed import (
        PackedDataPipeline, pack_dataset)

    ann = os.path.join(tiny_dataset_dir, "synthetic_annotations.json")
    tok = HashTokenizer()
    meta = pack_dataset(ann, str(tmp_path / "pack"), image_size=64,
                        tokenizer=tok, chunk_size=5)
    assert meta["num_samples"] == 12

    ds = SyntheticCaptionDataset(ann)
    live = CountingDataPipeline(ds, batch_size=4, image_size=64,
                                tokenizer=tok, seed=0)
    packed = PackedDataPipeline(str(tmp_path / "pack"), batch_size=4,
                                seed=0, expect_mode="standard",
                                expect_image_size=64)
    for epoch in (0, 1):
        for bl, bp in zip(live.epoch(epoch), packed.epoch(epoch)):
            assert set(bl) == set(bp)
            for k in bl:
                np.testing.assert_array_equal(bl[k], np.asarray(bp[k]))


def test_packed_counterfactual_and_validation(tiny_dataset_dir, tmp_path):
    from clip_finegrained_alignment_tpu.data.packed import (
        PackedDataPipeline, pack_dataset)

    ann = os.path.join(tiny_dataset_dir, "synthetic_annotations.json")
    pack_dataset(ann, str(tmp_path / "cf"), mode="counterfactual",
                 image_size=64, tokenizer=HashTokenizer())
    pipe = PackedDataPipeline(str(tmp_path / "cf"), batch_size=4,
                              expect_mode="counterfactual")
    b = next(iter(pipe.epoch(0)))
    assert b["cf_input_ids"].shape == (4, 9, 77)
    for i in range(4):
        assert b["count"][i] not in b["cf_counts"][i]

    # meta mismatches fail loudly instead of feeding wrong pixels/tokens
    with pytest.raises(ValueError, match="image_size"):
        PackedDataPipeline(str(tmp_path / "cf"), batch_size=4,
                           expect_image_size=224)
    with pytest.raises(ValueError, match="mode"):
        PackedDataPipeline(str(tmp_path / "cf"), batch_size=4,
                           expect_mode="standard")
    with pytest.raises(FileNotFoundError):
        PackedDataPipeline(str(tmp_path / "nope"), batch_size=4)


def test_packed_host_sharding(tiny_dataset_dir, tmp_path):
    """Two hosts cover the shuffled pack without overlap (same guarantee
    as the live pipeline — the shard machinery is shared)."""
    from clip_finegrained_alignment_tpu.data.packed import (
        PackedDataPipeline, pack_dataset)

    ann = os.path.join(tiny_dataset_dir, "synthetic_annotations.json")
    pack_dataset(ann, str(tmp_path / "p"), image_size=64,
                 tokenizer=HashTokenizer())
    seen = []
    for pi in range(2):
        pipe = PackedDataPipeline(str(tmp_path / "p"), batch_size=3,
                                  process_index=pi, process_count=2)
        for b in pipe.epoch(0):
            seen.extend(b["input_ids"][:, 1].tolist())
    assert len(seen) == 12


def test_device_resident_bank_matches_host_pixels(tiny_dataset_dir,
                                                  tmp_path):
    """index_only + pixel_bank: training from the HBM-resident bank must
    reproduce the host-pixel run bit-exactly (the gather + on-device
    normalize is the same math; only the transport changes)."""
    from clip_finegrained_alignment_tpu.config import TrainConfig
    from clip_finegrained_alignment_tpu.data.packed import (
        PackedDataPipeline, pack_dataset)
    from clip_finegrained_alignment_tpu.train.engine import Trainer

    ann = os.path.join(tiny_dataset_dir, "synthetic_annotations.json")
    tok = HashTokenizer(vocab_size=256)
    pack_dataset(ann, str(tmp_path / "dev"), image_size=32,
                 context_length=16, tokenizer=tok)

    cfg = TrainConfig(clip_model="tiny", batch_size=4,
                      gradient_accumulation_steps=2, lr=1e-3,
                      loss_type="clip", use_amp=False, log_every=1000)
    runs = {}
    for name, index_only in (("host", False), ("bank", True)):
        pipe = PackedDataPipeline(str(tmp_path / "dev"),
                                  cfg.effective_batch_size, seed=1,
                                  index_only=index_only)
        trainer = Trainer(cfg, pixel_bank=pipe.pixel_bank()
                          if index_only else None)
        runs[name] = trainer.train(pipe, num_epochs=2, log_fn=None)
    assert runs["host"]["global_step"] == runs["bank"]["global_step"] == 2
    assert runs["host"]["best_loss"] == runs["bank"]["best_loss"]
    h = [e["avg_loss"] for e in runs["host"]["history"]]
    b = [e["avg_loss"] for e in runs["bank"]["history"]]
    np.testing.assert_array_equal(h, b)


def test_device_resident_bank_parity_mesh(tiny_dataset_dir, tmp_path,
                                          eight_devices):
    """The bank composes with the DDP-parity shard_map mode: replicated
    bank, per-shard GLOBAL indices — same math as the host-pixel mesh
    run."""
    from clip_finegrained_alignment_tpu.config import (MeshConfig,
                                                       TrainConfig)
    from clip_finegrained_alignment_tpu.data.packed import (
        PackedDataPipeline, pack_dataset)
    from clip_finegrained_alignment_tpu.train.engine import Trainer

    ann = os.path.join(tiny_dataset_dir, "synthetic_annotations.json")
    pack_dataset(ann, str(tmp_path / "mesh"), image_size=32,
                 context_length=16, tokenizer=HashTokenizer(vocab_size=256))
    cfg = TrainConfig(clip_model="tiny", batch_size=8,
                      gradient_accumulation_steps=1, lr=1e-3,
                      loss_type="clip", use_amp=False, log_every=1000,
                      mesh=MeshConfig(data=4, model=1))
    losses = {}
    for name, index_only in (("host", False), ("bank", True)):
        pipe = PackedDataPipeline(str(tmp_path / "mesh"),
                                  cfg.effective_batch_size, seed=2,
                                  index_only=index_only)
        trainer = Trainer(cfg, pixel_bank=pipe.pixel_bank()
                          if index_only else None)
        losses[name] = trainer.train(pipe, num_epochs=1,
                                     log_fn=None)["best_loss"]
    np.testing.assert_allclose(losses["bank"], losses["host"], rtol=1e-6)


def test_packed_materialize_roundtrip(tiny_dataset_dir, tmp_path):
    from clip_finegrained_alignment_tpu.data.packed import (
        PackedDataPipeline, pack_dataset)

    ann = os.path.join(tiny_dataset_dir, "synthetic_annotations.json")
    pack_dataset(ann, str(tmp_path / "m"), image_size=64,
                 tokenizer=HashTokenizer())
    pix = PackedDataPipeline(str(tmp_path / "m"), batch_size=4, seed=0)
    idx = PackedDataPipeline(str(tmp_path / "m"), batch_size=4, seed=0,
                             index_only=True)
    b_pix = next(iter(pix.epoch(0)))
    b_idx = next(iter(idx.epoch(0)))
    assert "pixel_index" in b_idx and "pixel_values" not in b_idx
    mat = idx.materialize(b_idx)
    assert "pixel_index" not in mat
    for k in b_pix:
        np.testing.assert_array_equal(b_pix[k], mat[k])


def test_packed_train_cli_end_to_end(tiny_dataset_dir, tmp_path):
    """cli.pack_dataset → cli.train --packed runs a tiny training job."""
    import os as _os

    from clip_finegrained_alignment_tpu.cli.pack_dataset import \
        main as pack_main
    from clip_finegrained_alignment_tpu.cli.train import main as train_main

    _os.environ.setdefault("CFA_ALLOW_HASH_TOKENIZER", "1")
    ann = os.path.join(tiny_dataset_dir, "synthetic_annotations.json")
    pack_main(["--annotations", ann, "--output", str(tmp_path / "pk"),
               "--model", "tiny", "--loss-type", "clip"])
    train_main(["--packed", str(tmp_path / "pk"), "--model", "tiny",
                "--loss-type", "clip", "--batch-size", "8",
                "--grad-accum", "1", "--epochs", "1", "--no-amp",
                "--checkpoint-dir", str(tmp_path / "ck"),
                "--experiment-name", "pk"])
    # HBM-resident bank mode through the CLI
    train_main(["--packed", str(tmp_path / "pk"), "--device-data",
                "--model", "tiny", "--loss-type", "clip",
                "--batch-size", "8", "--grad-accum", "1", "--epochs", "1",
                "--no-amp", "--checkpoint-dir", str(tmp_path / "ck2"),
                "--experiment-name", "pk_dev"])


def test_visualize_dataset(tmp_path):
    """Bbox-overlay previews (gen_synthetic_data.py:347-378 parity): boxes
    + labels + packed integers in integer mode; caption-only render for
    count mode, which records no boxes (reference schema :308-315)."""
    import os

    from clip_finegrained_alignment_tpu.data.synthetic import (
        generate_procedural_dataset, visualize_dataset)

    anns = generate_procedural_dataset(str(tmp_path / "ds"), 2,
                                       image_size=96, max_objects=3,
                                       annotation_mode="integer", seed=5)
    paths = visualize_dataset(anns, str(tmp_path / "viz"), num_samples=2,
                              show_integers=True)
    assert len(paths) == 2 and all(os.path.getsize(p) > 0 for p in paths)

    anns_c = generate_procedural_dataset(str(tmp_path / "ds_c"), 1,
                                         image_size=96, max_objects=2,
                                         annotation_mode="count", seed=6)
    assert "boxes" not in anns_c[0]
    paths_c = visualize_dataset(anns_c, str(tmp_path / "viz_c"),
                                num_samples=1)
    assert os.path.getsize(paths_c[0]) > 0


def test_generate_data_cli_visualize(tmp_path):
    """cli.generate_data --visualize writes previews under <out>/viz/."""
    import os

    from clip_finegrained_alignment_tpu.cli.generate_data import main

    out = str(tmp_path / "gen")
    main(["--procedural", "--num-samples", "2", "--output-dir", out,
          "--image-size", "96", "--annotation-mode", "full",
          "--visualize", "2"])
    viz = os.path.join(out, "viz")
    assert sorted(os.listdir(viz)) == ["debug_0.png", "debug_1.png"]
