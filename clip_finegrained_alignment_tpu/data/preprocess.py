"""Image preprocessing: host-side decode + device-side fused pipeline.

The reference preprocesses per-sample in DataLoader worker processes through
HF ``CLIPProcessor`` (``synthetic_dataloader.py:69-76``) or OpenAI clip's
torchvision transform (``count_dataloader.py``): resize shortest edge
(bicubic) → center-crop 224 → scale 1/255 → normalize with the CLIP
mean/std. Here the cheap host part stays on host (decode + uint8 resize) and
the arithmetic (rescale, normalize, crop) is a **jitted JAX function fused
into the input pipeline** (BASELINE.json north star: "image decode+resize+
normalize preprocessing fuses into the XLA input pipeline") so the data
feed rides the VPU instead of per-sample Python.

NHWC layout throughout (TPU-native; torch is NCHW).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Published CLIP normalization constants (same values the HF processor and
# OpenAI transform use).
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


# ---------------------------------------------------------------------------
# Device-side (jitted, batched, fused by XLA)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("image_size", "antialias"))
def preprocess_batch(images: jax.Array, image_size: int = 224,
                     antialias: bool = True) -> jax.Array:
    """uint8/float [B, H, W, 3] → normalized float32 [B, S, S, 3].

    Resize-shorter-side + center-crop collapses to a single resize when the
    input is square (the synthetic dataset emits square images; the
    counterfactual loader pads to square first, ``count_dataloader.py:12-24``).
    For non-square inputs use ``resize_center_crop`` on host or pad first.
    """
    x = images.astype(jnp.float32) / 255.0
    if x.shape[1] != image_size or x.shape[2] != image_size:
        x = jax.image.resize(
            x, (x.shape[0], image_size, image_size, 3),
            method="bicubic", antialias=antialias)
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    return (x - mean) / std


def normalize_batch(x: jax.Array) -> jax.Array:
    """Normalize already-rescaled [0,1] float images."""
    mean = jnp.asarray(CLIP_MEAN, x.dtype)
    std = jnp.asarray(CLIP_STD, x.dtype)
    return (x - mean) / std


# ---------------------------------------------------------------------------
# Host-side (PIL; data prep / offline generation only)
# ---------------------------------------------------------------------------

def load_image(path: str) -> np.ndarray:
    """Decode to RGB uint8 [H, W, 3]."""
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def pad_to_square(image: np.ndarray, fill: int = 255) -> np.ndarray:
    """Pad to square with white — the counterfactual loader's transform
    (``count_dataloader.py:12-24`` pads with white so aspect ratio is
    preserved instead of squashed)."""
    h, w = image.shape[:2]
    if h == w:
        return image
    side = max(h, w)
    out = np.full((side, side, image.shape[2]), fill, image.dtype)
    top = (side - h) // 2
    left = (side - w) // 2
    out[top:top + h, left:left + w] = image
    return out


def resize_center_crop(image: np.ndarray, image_size: int = 224) -> np.ndarray:
    """Host-side resize-shorter-side (bicubic) + center crop, uint8→uint8 —
    byte-compatible with the HF processor's geometry for eval parity."""
    from PIL import Image
    h, w = image.shape[:2]
    scale = image_size / min(h, w)
    nh, nw = round(h * scale), round(w * scale)
    im = Image.fromarray(image).resize((nw, nh), Image.BICUBIC)
    arr = np.asarray(im)
    top = (nh - image_size) // 2
    left = (nw - image_size) // 2
    return arr[top:top + image_size, left:left + image_size]


def preprocess_host(image: np.ndarray, image_size: int = 224) -> np.ndarray:
    """Full host-side pipeline → float32 [S, S, 3] normalized (for eval
    paths that need exact HF-processor geometry on arbitrary images)."""
    arr = resize_center_crop(image, image_size).astype(np.float32) / 255.0
    return ((arr - np.asarray(CLIP_MEAN, np.float32))
            / np.asarray(CLIP_STD, np.float32))
