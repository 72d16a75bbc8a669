"""Serving-oriented inference APIs.

The reference has no serving path — every eval script re-encodes prompt
templates per sample (e.g. ``cb_eval.py:247-258``). For production use the
natural TPU pattern is: **precompute the text side once, stream images
through a fixed-shape jitted embedder**, and classify with one matmul.

* ``embed_images`` / ``embed_texts`` — batched, L2-normalized embeddings
  with automatic padding to a fixed bucket size (no recompiles for ragged
  final batches).
* ``ZeroShotClassifier`` — frozen prompt bank; ``predict`` is a single
  jitted image-tower forward + ``[B, P] @ [P, C]`` matmul on the MXU.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLIPConfig
from . import clip as m


def _pad_to_bucket(x: np.ndarray, bucket: int):
    n = x.shape[0]
    if n == bucket:
        return x, n
    pad = bucket - n
    return np.concatenate([x, np.repeat(x[-1:], pad, axis=0)]), n


class CLIPInference:
    """Jitted, bucketed embedding front-end over a param tree."""

    def __init__(self, params, cfg: CLIPConfig, *, dtype=jnp.bfloat16,
                 use_pallas: bool = False, batch_bucket: int = 64):
        self.params = params
        self.cfg = cfg
        self.bucket = batch_bucket
        # CFA_SERVE_PROFILE=1: synchronous uploads so the serving stats
        # decompose batch latency into upload vs compute+fetch.
        import os
        self._block_uploads = os.environ.get("CFA_SERVE_PROFILE",
                                             "0") == "1"

        @jax.jit
        def embed_images(params, pixel_values):
            if pixel_values.dtype == jnp.uint8:
                from ..data.preprocess import normalize_batch
                pixel_values = normalize_batch(
                    pixel_values.astype(jnp.float32) / 255.0)
            e = m.encode_image(params, pixel_values, cfg, dtype=dtype,
                               use_pallas=use_pallas).astype(jnp.float32)
            return e / jnp.linalg.norm(e, axis=-1, keepdims=True)

        @jax.jit
        def embed_texts(params, input_ids):
            e = m.encode_text(params, input_ids, cfg, dtype=dtype,
                              use_pallas=use_pallas).astype(jnp.float32)
            return e / jnp.linalg.norm(e, axis=-1, keepdims=True)

        self._embed_images = embed_images
        self._embed_texts = embed_texts

    def _dispatch(self, fn, x: np.ndarray) -> list:
        """Enqueue bucketed device work WITHOUT blocking on results.

        Upload (``jnp.asarray``) and the jitted call are async under JAX
        dispatch, so a caller can keep feeding the device while earlier
        batches are still in flight — the serving batcher uses this to
        overlap the host→device transfer of batch k+1 with the compute +
        result fetch of batch k (the transfer dominates behind a slow
        link: ~9.6 MB per 64-image uint8 bucket). Returns opaque
        handles for :meth:`_fetch`."""
        handles = []
        for i in range(0, len(x), self.bucket):
            chunk, n = _pad_to_bucket(x[i:i + self.bucket], self.bucket)
            dev = jnp.asarray(chunk)
            if self._block_uploads:
                # Stage-profiling mode: force the transfer to finish here
                # so upload and compute time separately. The element fetch
                # is the reliable sync on the tunnel transport
                # (block_until_ready can return early through it).
                jax.block_until_ready(dev)
                float(dev.ravel()[0])
            handles.append((fn(self.params, dev), n))
        return handles

    @staticmethod
    def _fetch(handles: list) -> np.ndarray:
        outs = [np.asarray(h)[:n] for h, n in handles]
        return np.concatenate(outs) if outs else np.zeros((0,))

    def dispatch_images(self, pixel_values: np.ndarray) -> list:
        """Async form of :meth:`embed_images`; finish with :meth:`fetch`."""
        return self._dispatch(self._embed_images, pixel_values)

    def dispatch_texts(self, input_ids: np.ndarray) -> list:
        return self._dispatch(self._embed_texts, input_ids)

    fetch = _fetch

    def _run_bucketed(self, fn, x: np.ndarray) -> np.ndarray:
        return self._fetch(self._dispatch(fn, x))

    def embed_images(self, pixel_values: np.ndarray) -> np.ndarray:
        """[N, S, S, 3] (uint8 or normalized f32) → [N, P] normalized."""
        return self._run_bucketed(self._embed_images, pixel_values)

    def embed_texts(self, input_ids: np.ndarray) -> np.ndarray:
        """[N, T] int32 → [N, P] normalized."""
        return self._run_bucketed(self._embed_texts, input_ids)


class ZeroShotClassifier:
    """Frozen prompt bank + streaming image classification."""

    def __init__(self, inference: CLIPInference, prompts: Sequence[str],
                 tokenizer=None):
        from ..data.tokenizer import load_tokenizer
        tok = tokenizer if tokenizer is not None else load_tokenizer()
        ids = tok(list(prompts),
                  inference.cfg.text.max_position_embeddings)
        self.inference = inference
        self.prompts = list(prompts)
        self.text_features = inference.embed_texts(ids)     # [C, P]
        scale = np.exp(float(np.asarray(
            inference.params["logit_scale"])))
        self._scale = scale

    def logits(self, pixel_values: np.ndarray) -> np.ndarray:
        img = self.inference.embed_images(pixel_values)      # [N, P]
        return self._scale * img @ self.text_features.T      # [N, C]

    def predict(self, pixel_values: np.ndarray):
        """→ (class indices [N], probabilities [N, C])."""
        lg = self.logits(pixel_values)
        e = np.exp(lg - lg.max(axis=-1, keepdims=True))
        probs = e / e.sum(axis=-1, keepdims=True)
        return probs.argmax(axis=-1), probs
