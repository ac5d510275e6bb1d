"""Padded image batches (TPU-native ImageList).

The reference's ``ImageList`` (maskrcnn_benchmark/structures/image_list.py)
pads each batch to the max size in the batch, rounded up to a multiple of 32.
Dynamic per-batch shapes recompile on TPU, so this framework pads to a small
set of fixed *resolution buckets* (cfg.TPU.QUERY_BUCKETS) instead; XLA then
compiles one program per bucket.

Layout is NHWC (TPU-native), not the reference's NCHW.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class ImageBatch:
    """A batch of images padded to a common static shape.

    Attributes:
      pixels: (B, H, W, 3) float — normalized pixel data, zero-padded.
      sizes: (B, 2) float — true (height, width) of each image before padding
        (same ordering as ImageList.image_sizes, image_list.py:22-30).
    """

    pixels: jnp.ndarray
    sizes: jnp.ndarray

    @property
    def batch_size(self) -> int:
        return self.pixels.shape[0]

    @property
    def padded_hw(self):
        return self.pixels.shape[1], self.pixels.shape[2]

    def sizes_wh(self) -> jnp.ndarray:
        """(B, 2) as (width, height) — the BoxList.size convention."""
        return self.sizes[:, ::-1]


def round_up(x: int, divisor: int) -> int:
    return int(-(-x // divisor) * divisor)


def to_image_batch(images, bucket_hw=None, size_divisible: int = 32) -> ImageBatch:
    """Host-side analog of to_image_list (image_list.py:40-74).

    Args:
      images: list of (h, w, 3) numpy arrays (already normalized).
      bucket_hw: optional fixed (H, W); if None, uses max-in-batch rounded up
        to ``size_divisible`` (reference behavior — fine on CPU, avoid on TPU).
    """
    if bucket_hw is None:
        max_h = round_up(max(im.shape[0] for im in images), size_divisible)
        max_w = round_up(max(im.shape[1] for im in images), size_divisible)
    else:
        max_h, max_w = bucket_hw
    batch = np.zeros((len(images), max_h, max_w, 3), dtype=np.float32)
    sizes = np.zeros((len(images), 2), dtype=np.float32)
    for i, im in enumerate(images):
        h, w = im.shape[:2]
        if h > max_h or w > max_w:
            raise ValueError(f"image ({h},{w}) exceeds bucket ({max_h},{max_w})")
        batch[i, :h, :w] = im
        sizes[i] = (h, w)
    return ImageBatch(pixels=jnp.asarray(batch), sizes=jnp.asarray(sizes))
