"""Native host data-plane (C++ libcfa_host) tests. Skipped wholesale when
the toolchain/image libraries are unavailable — every consumer has a
PIL/numpy fallback, which the rest of the suite exercises."""

import os

import numpy as np
import pytest
from PIL import Image

from clip_finegrained_alignment_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native library unavailable: {native.build_error()}")


@pytest.fixture(scope="module")
def image_files(tmp_path_factory, rng):
    d = tmp_path_factory.mktemp("imgs")
    paths = []
    for i, (h, w) in enumerate([(60, 60), (100, 40), (33, 97)]):
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        p = str(d / f"i{i}.png")
        Image.fromarray(img).save(p)
        paths.append((p, img))
        pj = str(d / f"i{i}.jpg")
        Image.fromarray(img).save(pj, quality=95)
        paths.append((pj, img))
    return paths


def test_png_decode_bit_exact(image_files):
    for path, ref in image_files:
        if not path.endswith(".png"):
            continue
        out = native.decode_image(path)
        np.testing.assert_array_equal(out, ref)


def test_jpeg_decode_matches_pil(image_files):
    """Both paths use libjpeg, so decodes should agree to the LSB."""
    for path, ref in image_files:
        if not path.endswith(".jpg"):
            continue
        out = native.decode_image(path)
        pil = np.asarray(Image.open(path).convert("RGB"))
        assert out.shape == pil.shape
        assert np.abs(out.astype(int) - pil.astype(int)).max() <= 1


def test_decode_missing_file():
    assert native.decode_image("/nonexistent/x.png") is None


def test_assemble_batch_shapes_and_threads(image_files):
    paths = [p for p, _ in image_files]
    out = native.assemble_batch(paths, size=48, pad_to_square=True,
                                threads=4)
    assert out.shape == (len(paths), 48, 48, 3)
    assert out.dtype == np.uint8
    assert (out.reshape(len(paths), -1).max(axis=1) > 0).all()
    # deterministic regardless of thread count
    out1 = native.assemble_batch(paths, size=48, pad_to_square=True,
                                 threads=1)
    np.testing.assert_array_equal(out, out1)


def test_assemble_batch_failed_slot_zeroed(image_files, tmp_path):
    paths = [image_files[0][0], str(tmp_path / "missing.png")]
    out = native.assemble_batch(paths, size=32)
    assert (out[1] == 0).all() and (out[0] != 0).any()


def test_alpha_paste_matches_numpy(rng):
    from clip_finegrained_alignment_tpu.data import synthetic
    dst_native = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    dst_numpy = dst_native.copy()
    obj = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    alpha = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    native.alpha_paste(dst_native, obj, alpha, 30, -5)   # clipped paste
    # numpy reference path (bypass the native fast path)
    h, w = obj.shape[:2]
    H, W = dst_numpy.shape[:2]
    x, y = 30, -5
    x0, y0, x1, y1 = max(0, x), max(0, y), min(W, x + w), min(H, y + h)
    region = obj[y0 - y:y1 - y, x0 - x:x1 - x]
    a = alpha[y0 - y:y1 - y, x0 - x:x1 - x, None].astype(np.int32)
    dst_numpy[y0:y1, x0:x1] = (
        (a * region + (255 - a) * dst_numpy[y0:y1, x0:x1]) // 255
    ).astype(np.uint8)
    np.testing.assert_array_equal(dst_native, dst_numpy)


def test_pipeline_native_vs_pil_square_images(tmp_path, rng):
    """On square images at generation size (no resample), native and PIL
    paths produce identical batches."""
    from clip_finegrained_alignment_tpu.data.datasets import (
        CountingDataPipeline, SyntheticCaptionDataset)
    from clip_finegrained_alignment_tpu.data.synthetic import (
        generate_procedural_dataset)
    from clip_finegrained_alignment_tpu.data.tokenizer import HashTokenizer

    generate_procedural_dataset(str(tmp_path), num_samples=8,
                                image_size=64, max_objects=2, seed=11)
    ds = SyntheticCaptionDataset(
        os.path.join(str(tmp_path), "synthetic_annotations.json"))
    kw = dict(batch_size=8, image_size=64, tokenizer=HashTokenizer(),
              shuffle=False)
    b_native = next(iter(CountingDataPipeline(
        ds, use_native="always", **kw).epoch(0)))
    b_pil = next(iter(CountingDataPipeline(
        ds, use_native="never", **kw).epoch(0)))
    np.testing.assert_array_equal(b_native["pixel_values"],
                                  b_pil["pixel_values"])
    np.testing.assert_array_equal(b_native["input_ids"],
                                  b_pil["input_ids"])


def test_assemble_center_crop_geometry(tmp_path):
    """MODE_CENTER_CROP must use the HF-processor window (shorter-side
    resize + center crop), not the legacy aspect-squash (ADVICE.md round 1:
    'auto' silently trained on squashed non-square images)."""
    if not native.available():
        pytest.skip(native.build_error())
    # 400x200 (WxH): red 100px bands left/right, green 200x200 center.
    img = np.zeros((200, 400, 3), np.uint8)
    img[:, :, 0] = 255                      # all red
    img[:, 100:300] = (0, 255, 0)           # green center square
    p = str(tmp_path / "wide.png")
    Image.fromarray(img).save(p)

    size = 64
    crop = native.assemble_batch([p], size, mode=native.MODE_CENTER_CROP)[0]
    # Center crop keeps only the green square: no red anywhere.
    assert (crop[:, :, 1] > 200).all() and (crop[:, :, 0] < 50).all()

    stretch = native.assemble_batch([p], size, mode=native.MODE_STRETCH)[0]
    # The squash keeps the red bands (the old, wrong behavior for
    # 'standard' mode).
    assert (stretch[:, :4, 0] > 200).all()

    # And the crop window matches the PIL path exactly (same pixels in;
    # only the resampling kernel differs) — compare against PIL BOX
    # resize + identical crop arithmetic.
    from clip_finegrained_alignment_tpu.data.preprocess import (
        resize_center_crop)
    pil_geom = resize_center_crop(img, size)
    assert pil_geom.shape == crop.shape
    # Solid-color regions are filter-invariant: byte-equal there.
    np.testing.assert_array_equal(crop[8:-8, 8:-8], pil_geom[8:-8, 8:-8])


def test_assemble_center_crop_tall_image(tmp_path):
    """Tall (H>W) orientation crops rows, not columns."""
    if not native.available():
        pytest.skip(native.build_error())
    img = np.zeros((400, 200, 3), np.uint8)
    img[:, :, 2] = 255                      # all blue
    img[100:300, :] = (255, 255, 0)          # yellow center square
    p = str(tmp_path / "tall.png")
    Image.fromarray(img).save(p)
    crop = native.assemble_batch([p], 64, mode=native.MODE_CENTER_CROP)[0]
    assert (crop[:, :, 0] > 200).all() and (crop[:, :, 2] < 50).all()


def test_bicubic_matches_pil(rng):
    """The native antialiased bicubic must reproduce PIL.Image.BICUBIC
    (the HF/torchvision reference kernel) to <=1 LSB — PIL quantizes
    filter weights to int16, we keep float64; everything else (kernel,
    support scaling, pass order, uint8 intermediate) is identical."""
    for (sh, sw), (dh, dw) in [((300, 500), (224, 224)),   # downscale
                               ((97, 61), (224, 224)),     # upscale
                               ((224, 224), (67, 131))]:   # asymmetric
        img = rng.integers(0, 256, size=(sh, sw, 3), dtype=np.uint8)
        ours = native.resize_bicubic(img, dh, dw)
        pil = np.asarray(Image.fromarray(img).resize((dw, dh),
                                                     Image.BICUBIC))
        diff = np.abs(ours.astype(int) - pil.astype(int)).max()
        assert diff <= 1, (sh, sw, dh, dw, diff)


def test_assemble_bicubic_matches_pil_center_crop(tmp_path, rng):
    """Default-filter assemble_batch (bicubic) == the PIL loader path
    (resize_center_crop) to <=1 LSB on non-square photographic inputs —
    the 'use_native changes data numerics' gap is closed."""
    from clip_finegrained_alignment_tpu.data.preprocess import (
        resize_center_crop)
    paths, refs = [], []
    for i, (h, w) in enumerate([(300, 460), (461, 333)]):
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        p = str(tmp_path / f"p{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
        refs.append(resize_center_crop(img, 224))
    out = native.assemble_batch(paths, 224, mode=native.MODE_CENTER_CROP)
    for o, r in zip(out, refs):
        assert np.abs(o.astype(int) - r.astype(int)).max() <= 1
    # box filter stays available for speed
    out_box = native.assemble_batch(paths, 224,
                                    mode=native.MODE_CENTER_CROP,
                                    filter=native.FILTER_BOX)
    assert not np.array_equal(out, out_box)


def test_failed_mask_reports_exact_paths(tmp_path, caplog):
    """Decode failures are reported from the C layer's per-sample mask —
    an all-black (legitimately zero) image must NOT be flagged (advisor
    finding: inferring failures from zero rows misreports black images)."""
    import logging as _logging
    black = str(tmp_path / "black.png")
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(black)
    missing = str(tmp_path / "missing.png")
    with caplog.at_level(_logging.WARNING,
                         logger="clip_finegrained_alignment_tpu.native"):
        out = native.assemble_batch([black, missing], 16)
    assert (out == 0).all()
    joined = " ".join(r.message for r in caplog.records)
    assert "missing.png" in joined and "black.png" not in joined
