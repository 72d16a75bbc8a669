"""Serving front-end tests (``cli/serve.py``).

The reference has no serving path (SURVEY.md §2: every eval script runs
1-image forwards); these pin the TPU-native server: endpoint math equals
the direct ``CLIPInference`` calls, the HF-processor geometry is applied
to encoded request images, and concurrent requests coalesce into shared
device batches (the dynamic-batching contract).
"""

import base64
import io
import json
import threading
from http.client import HTTPConnection

import numpy as np
import pytest

from clip_finegrained_alignment_tpu.cli.serve import (ClipServer,
                                                      make_server)
from clip_finegrained_alignment_tpu.config import CLIPConfig
from clip_finegrained_alignment_tpu.data.tokenizer import HashTokenizer
from clip_finegrained_alignment_tpu.models import clip as m
from clip_finegrained_alignment_tpu.models.inference import CLIPInference


@pytest.fixture(scope="module")
def served():
    import jax
    cfg = CLIPConfig.tiny_test()
    params = m.init_clip_params(jax.random.key(3), cfg)
    tok = HashTokenizer(vocab_size=cfg.text.vocab_size,
                        bos_token_id=cfg.text.bos_token_id,
                        eos_token_id=cfg.text.eos_token_id,
                        pad_token_id=cfg.text.pad_token_id)
    clip = ClipServer(params, cfg, tok, model_name="tiny", bucket=8,
                      window_ms=20.0)
    srv = make_server(clip)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield clip, srv.server_port, params, cfg, tok
    srv.shutdown()
    clip.batcher.close()


def _post(port, path, payload):
    conn = HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", path, json.dumps(payload),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    body = json.loads(resp.read())
    conn.close()
    return resp.status, body


def _get(port, path):
    conn = HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", path)
    resp = conn.getresponse()
    body = json.loads(resp.read())
    conn.close()
    return resp.status, body


def test_healthz(served):
    _, port, *_ = served
    status, body = _get(port, "/healthz")
    assert status == 200 and body["status"] == "ok"
    assert body["model"] == "tiny"


def test_embed_text_matches_direct(served):
    clip, port, params, cfg, tok = served
    texts = ["three cats", "a photo of seven dogs"]
    status, body = _post(port, "/v1/embed/text", {"texts": texts})
    assert status == 200
    got = np.asarray(body["embeddings"], np.float32)
    direct = CLIPInference(params, cfg, batch_bucket=8).embed_texts(
        np.asarray(tok(texts, cfg.text.max_position_embeddings), np.int32))
    np.testing.assert_allclose(got, direct, rtol=0, atol=1e-5)
    # L2-normalized
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0,
                               atol=1e-4)


def test_embed_image_pixels_matches_direct(served):
    clip, port, params, cfg, _ = served
    S = cfg.vision.image_size
    rng = np.random.default_rng(0)
    pix = rng.integers(0, 256, size=(3, S, S, 3)).astype(np.uint8)
    status, body = _post(port, "/v1/embed/image",
                         {"pixels": pix.tolist()})
    assert status == 200
    got = np.asarray(body["embeddings"], np.float32)
    direct = CLIPInference(params, cfg, batch_bucket=8).embed_images(pix)
    np.testing.assert_allclose(got, direct, rtol=0, atol=1e-5)


def test_embed_image_b64_applies_processor_geometry(served):
    from PIL import Image
    from clip_finegrained_alignment_tpu.data.preprocess import \
        resize_center_crop
    clip, port, params, cfg, _ = served
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, size=(48, 64, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(raw).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    status, body = _post(port, "/v1/embed/image", {"images_b64": [b64]})
    assert status == 200
    got = np.asarray(body["embeddings"], np.float32)
    expect = CLIPInference(params, cfg, batch_bucket=8).embed_images(
        resize_center_crop(raw, cfg.vision.image_size)[None])
    np.testing.assert_allclose(got, expect, rtol=0, atol=1e-5)


def test_embed_image_raw_matches_json_endpoint(served):
    """The binary fast path (/v1/embed/image_raw): raw uint8 bytes in,
    raw float32 out with X-Embed-Shape — same math as the JSON route."""
    clip, port, params, cfg, _ = served
    S = cfg.vision.image_size
    rng = np.random.default_rng(2)
    pix = rng.integers(0, 256, size=(3, S, S, 3)).astype(np.uint8)

    conn = HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", "/v1/embed/image_raw", pix.tobytes(),
                 {"Content-Type": "application/octet-stream"})
    resp = conn.getresponse()
    raw = resp.read()
    shape = tuple(int(x) for x in
                  resp.getheader("X-Embed-Shape").split(","))
    conn.close()
    assert resp.status == 200
    got = np.frombuffer(raw, np.float32).reshape(shape)
    assert shape[0] == 3
    direct = CLIPInference(params, cfg, batch_bucket=8).embed_images(pix)
    np.testing.assert_allclose(got, direct, rtol=0, atol=1e-5)

    # malformed body (not a multiple of S*S*3) → 400, not a hang
    conn = HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", "/v1/embed/image_raw", b"abc",
                 {"Content-Type": "application/octet-stream"})
    resp = conn.getresponse()
    body = json.loads(resp.read())
    conn.close()
    assert resp.status == 400 and "error" in body


def test_classify_probs(served):
    clip, port, params, cfg, _ = served
    S = cfg.vision.image_size
    pix = np.zeros((2, S, S, 3), np.uint8)
    payload = {"pixels": pix.tolist(),
               "labels": ["one cat", "two cats", "three cats"]}
    status, body = _post(port, "/v1/classify", payload)
    assert status == 200
    assert body["labels"] == payload["labels"]
    probs = np.asarray(body["probs"])
    assert probs.shape == (2, 3)
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-5)
    # Prompt bank cached: second call hits the cache (same result).
    _, body2 = _post(port, "/v1/classify", payload)
    np.testing.assert_allclose(np.asarray(body2["probs"]), probs,
                               atol=1e-6)
    assert ("a photo of {}", tuple(payload["labels"])) \
        in clip._prompt_cache


def test_concurrent_requests_coalesce(served):
    clip, port, params, cfg, tok = served
    before = dict(clip.batcher.stats)
    results = {}

    def worker(i):
        status, body = _post(port, "/v1/embed/text",
                             {"texts": [f"sample {i}"]})
        results[i] = (status, body["embeddings"])

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(s == 200 for s, _ in results.values())
    items = clip.batcher.stats["items"] - before["items"]
    batches = clip.batcher.stats["batches"] - before["batches"]
    assert items == 8
    # 8 single-item requests inside one 20 ms window must share device
    # batches — strictly fewer batches than items proves coalescing.
    assert batches < items, (items, batches)
    # Each request got the embedding of ITS OWN text (no future mix-up
    # inside the shared batch) — compare against the direct embedder
    # rather than pairwise distinctness, which is hash-tokenizer-collision
    # flaky at the tiny test vocab.
    inf = CLIPInference(params, cfg, batch_bucket=8)
    direct = inf.embed_texts(np.asarray(
        tok([f"sample {i}" for i in range(8)],
            cfg.text.max_position_embeddings), np.int32))
    for i in range(8):
        np.testing.assert_allclose(np.asarray(results[i][1][0]),
                                   direct[i], rtol=0, atol=1e-5)


def test_bad_route_and_bad_payload(served):
    _, port, *_ = served
    status, body = _get(port, "/nope")
    assert status == 404
    status, body = _post(port, "/v1/embed/text", {"wrong": 1})
    assert status == 400 and "error" in body
