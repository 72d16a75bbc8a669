"""Online-serving benchmark: the HTTP front-end under concurrent load.

Measures what `perf/serve_bench.py` (offline device-batch rates) cannot:
the **dynamic request batcher** (`cli/serve.py`) under many concurrent
clients — requests/s, latency quantiles, and the achieved device-batch
fill. Run on the chip::

    python perf/serve_http_bench.py [clients] [requests-per-client]

Caveats for this environment: ONE host CPU core does all JSON
(de)serialization and the TPU sits behind a ~30 MB/s network tunnel, so
absolute numbers are host/tunnel-bound; the artifact of interest is the
batch-fill (coalescing working under load) and the latency distribution.
"""

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# Throughput does not depend on real token ids; keep the run hermetic.
os.environ.setdefault("CFA_ALLOW_HASH_TOKENIZER", "1")


def main():
    clients = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    per_client = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    model = "ViT-B/32"

    import jax  # noqa: F401  (device selection via sitecustomize)

    from clip_finegrained_alignment_tpu.cli.serve import (ClipServer,
                                                          make_server)
    from clip_finegrained_alignment_tpu.config import CLIPConfig
    from clip_finegrained_alignment_tpu.data.tokenizer import load_tokenizer
    from clip_finegrained_alignment_tpu.models import clip as m

    cfg = CLIPConfig.from_name(model)
    params = m.init_clip_params(jax.random.key(0), cfg)
    tok = load_tokenizer()
    clip = ClipServer(params, cfg, tok, model_name=model, bucket=64,
                      window_ms=3.0)
    srv = make_server(clip)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_port
    S = cfg.vision.image_size

    print(f"warmup (compiles) ...", flush=True)
    clip.embed_texts(["warmup"])
    clip.embed_images({"pixels": np.zeros((1, S, S, 3), np.uint8)})

    from http.client import HTTPConnection

    rng = np.random.default_rng(0)
    pixels = rng.integers(0, 256, size=(1, S, S, 3), dtype=np.uint8)
    img_payload = json.dumps({"pixels": pixels.astype(int).tolist()})
    txt_payload = json.dumps({"texts": ["a photo of three cats"]})
    raw_payload = pixels.tobytes()  # the binary fast path

    results = {}
    for name, path, payload, ctype in (
            ("text", "/v1/embed/text", txt_payload, "application/json"),
            ("image", "/v1/embed/image", img_payload, "application/json"),
            ("image_raw", "/v1/embed/image_raw", raw_payload,
             "application/octet-stream")):
        lats = []
        lock = threading.Lock()

        def worker():
            conn = HTTPConnection("127.0.0.1", port, timeout=300)
            mine = []
            for _ in range(per_client):
                t0 = time.perf_counter()
                conn.request("POST", path, payload,
                             {"Content-Type": ctype})
                resp = conn.getresponse()
                body = resp.read()
                assert resp.status == 200, body[:200]
                mine.append((time.perf_counter() - t0) * 1000.0)
            conn.close()
            with lock:
                lats.extend(mine)

        before = dict(clip.batcher.stats)
        for k in ("latency_ms", "queue_wait_ms", "dispatch_ms"):
            clip.batcher.stats[k].clear()  # per-endpoint stage windows
        threads = [threading.Thread(target=worker) for _ in range(clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        items = clip.batcher.stats["items"] - before["items"]
        batches = clip.batcher.stats["batches"] - before["batches"]
        lats.sort()
        q = lambda p: lats[int(p * (len(lats) - 1))]
        results[name] = {
            "requests_per_sec": round(len(lats) / dt, 1),
            "latency_ms_p50": round(q(0.5), 1),
            "latency_ms_p95": round(q(0.95), 1),
            "mean_batch_fill": round(items / max(batches, 1), 2),
            "clients": clients, "n": len(lats),
        }
        # Server-side stage breakdown (per device batch): queue wait /
        # dispatch (≈ upload under CFA_SERVE_PROFILE=1) / device+fetch.
        results[name]["stages"] = {
            k: v for k, v in clip.stats().items()
            if k.endswith(("p50", "p95"))}
        print(f"{name}: {results[name]}", flush=True)

    srv.shutdown()
    clip.batcher.close()
    print(json.dumps({"model": model, **results}))


if __name__ == "__main__":
    main()
