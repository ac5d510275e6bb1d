"""Host-side image transforms (reference: maskrcnn_benchmark/data/transforms/).

Operates on PIL images + numpy boxes and outputs normalized float32 HWC
arrays ready for bucket padding. Semantics preserved bit-for-bit:

  - Resize: aspect-preserving min-side resize capped by max-side
    (transforms.py:27-63, including the int(round(...)) cap rule);
  - RandomHorizontalFlip with the BoxList.transpose TO_REMOVE=1 flip;
  - Normalize: RGB -> BGR, x255, subtract PIXEL_MEAN, divide PIXEL_STD
    (transforms.py:79-90 with to_bgr255=True);
  - support color jitter (ImageEnhance chain, coco.py:286-294).

An on-device jittable variant (`device_preprocess`) fuses resize + normalize
+ pad for the streaming predictor path (BASELINE.json config #5).
"""

from __future__ import annotations

import random
from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageEnhance


def get_resize_size(image_wh: Tuple[int, int], min_size: int, max_size: Optional[int]):
    """Target (h, w) for aspect-preserving resize (transforms.py:37-57)."""
    w, h = image_wh
    size = min_size
    if max_size is not None:
        min_orig = float(min(w, h))
        max_orig = float(max(w, h))
        if max_orig / min_orig * size > max_size:
            size = int(round(max_size * min_orig / max_orig))
    if (w <= h and w == size) or (h <= w and h == size):
        return (h, w)
    if w < h:
        ow = size
        oh = int(size * h / w)
    else:
        oh = size
        ow = int(size * w / h)
    return (oh, ow)


class Resize:
    def __init__(self, min_size, max_size):
        if not isinstance(min_size, (list, tuple)):
            min_size = (min_size,)
        self.min_size = tuple(min_size)
        self.max_size = max_size

    def __call__(self, image: Image.Image, boxes: Optional[np.ndarray], masks=None):
        size = random.choice(self.min_size)
        oh, ow = get_resize_size(image.size, size, self.max_size)
        w0, h0 = image.size
        image = image.resize((ow, oh), Image.BILINEAR)
        if boxes is not None and len(boxes):
            boxes = boxes.astype(np.float32).copy()
            boxes[:, 0::2] *= ow / w0
            boxes[:, 1::2] *= oh / h0
        if masks is not None:
            masks = [m.resize((ow, oh)) for m in masks]
            return image, boxes, masks
        return image, boxes


class RandomHorizontalFlip:
    def __init__(self, prob=0.5):
        self.prob = prob

    def __call__(self, image, boxes, masks=None):
        if random.random() < self.prob:
            w = image.size[0]
            image = image.transpose(Image.FLIP_LEFT_RIGHT)
            if boxes is not None and len(boxes):
                boxes = boxes.copy()
                x1 = w - boxes[:, 2] - 1.0  # TO_REMOVE flip (bounding_box.py:145)
                x2 = w - boxes[:, 0] - 1.0
                boxes[:, 0], boxes[:, 2] = x1, x2
            if masks is not None:
                from ..structures.segmentation_mask import FLIP_LEFT_RIGHT

                masks = [m.transpose(FLIP_LEFT_RIGHT) for m in masks]
        if masks is not None:
            return image, boxes, masks
        return image, boxes


class Normalize:
    def __init__(self, mean, std, to_bgr255=True):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_bgr255 = to_bgr255

    def __call__(self, image, boxes, masks=None):
        arr = np.asarray(image, np.float32) / 255.0  # to_tensor scaling
        if self.to_bgr255:
            arr = arr[:, :, ::-1] * 255.0
        arr = (arr - self.mean) / self.std
        if masks is not None:
            return np.ascontiguousarray(arr), boxes, masks
        return np.ascontiguousarray(arr), boxes


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, image, boxes, masks=None):
        if masks is not None:
            for t in self.transforms:
                image, boxes, masks = t(image, boxes, masks)
            return image, boxes, masks
        for t in self.transforms:
            image, boxes = t(image, boxes)
        return image, boxes


def color_jitter(image: Image.Image) -> Image.Image:
    """Support augmentation jitter (coco.py:286-294)."""
    for enhancer in (ImageEnhance.Color, ImageEnhance.Brightness,
                     ImageEnhance.Contrast, ImageEnhance.Sharpness):
        image = enhancer(image).enhance(np.random.uniform(0.1, 2))
    return image


def build_transforms(cfg, is_train=True):
    """Returns [query_transform, support_transform] (transforms/build.py:5-52)."""
    if is_train:
        min_size = cfg.INPUT.MIN_SIZE_TRAIN
        supp_min_size = cfg.INPUT.SUPP_MIN_SIZE_TRAIN
        max_size = cfg.INPUT.MAX_SIZE_TRAIN
        supp_max_size = cfg.INPUT.SUPP_MAX_SIZE_TRAIN
        flip_prob = 0.5
    else:
        min_size = cfg.INPUT.MIN_SIZE_TEST
        supp_min_size = cfg.INPUT.SUPP_MIN_SIZE_TEST
        max_size = cfg.INPUT.MAX_SIZE_TEST
        supp_max_size = cfg.INPUT.SUPP_MAX_SIZE_TEST
        flip_prob = 0.0
    normalize = Normalize(cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD, cfg.INPUT.TO_BGR255)
    query_t = Compose([Resize(min_size, max_size), RandomHorizontalFlip(flip_prob), normalize])
    supp_t = Compose([Resize(supp_min_size, supp_max_size), RandomHorizontalFlip(flip_prob), normalize])
    return [query_t, supp_t]


# ---------------------------------------------------------------------------
# On-device preprocessing (jittable) for the streaming predictor
# ---------------------------------------------------------------------------
def device_preprocess(pixels_rgb_uint8, out_hw, min_size, max_size,
                      pixel_mean, pixel_std, to_bgr255=True):
    """Fused resize + normalize + pad as one jittable function.

    Args:
      pixels_rgb_uint8: (H, W, 3) uint8/float RGB image on device.
      out_hw: static (H, W) padded bucket.
    Returns: (pixels (H, W, 3) float32 normalized, true_size (2,) = (h, w)).
    """
    import jax
    import jax.numpy as jnp

    h0, w0 = pixels_rgb_uint8.shape[:2]
    oh, ow = get_resize_size((w0, h0), min_size, max_size)
    img = jax.image.resize(
        pixels_rgb_uint8.astype(jnp.float32), (oh, ow, 3), method="bilinear"
    ) / 255.0
    if to_bgr255:
        img = img[:, :, ::-1] * 255.0
    img = (img - jnp.asarray(pixel_mean)) / jnp.asarray(pixel_std)
    out = jnp.zeros((*out_hw, 3), jnp.float32)
    out = out.at[:oh, :ow].set(img)
    return out, jnp.array([oh, ow], jnp.float32)


class FusedHostPreprocess:
    """Native fused resize+normalize+pad path (oneshotdet_tpu/csrc).

    Instead of materializing a resized+normalized float image per sample
    (PIL resize -> numpy normalize -> collator pad: three passes, ~70 ms for
    an 800x1066 target), this transform defers the pixel work: it returns
    the decoded uint8 array plus the resample target, and the collator
    writes each image straight into its batch slot with one fused C++ pass
    (~22 ms). Boxes are resized/flipped here as usual.
    """

    def __init__(self, min_size, max_size, flip_prob, mean, std, to_bgr255=True):
        if not isinstance(min_size, (list, tuple)):
            min_size = (min_size,)
        self.min_size = tuple(min_size)
        self.max_size = max_size
        self.flip_prob = flip_prob
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_bgr255 = to_bgr255

    def __call__(self, image: Image.Image, boxes, masks=None):
        size = random.choice(self.min_size)
        oh, ow = get_resize_size(image.size, size, self.max_size)
        w0, h0 = image.size
        arr = np.asarray(image, np.uint8)
        if boxes is not None and len(boxes):
            boxes = boxes.astype(np.float32).copy()
            boxes[:, 0::2] *= ow / w0
            boxes[:, 1::2] *= oh / h0
        if masks is not None:
            masks = [m.resize((ow, oh)) for m in masks]
        if self.flip_prob > 0 and random.random() < self.flip_prob:
            arr = arr[:, ::-1]
            if boxes is not None and len(boxes):
                x1 = ow - boxes[:, 2] - 1.0
                x2 = ow - boxes[:, 0] - 1.0
                boxes = boxes.copy()
                boxes[:, 0], boxes[:, 2] = x1, x2
            if masks is not None:
                from ..structures.segmentation_mask import FLIP_LEFT_RIGHT

                masks = [m.transpose(FLIP_LEFT_RIGHT) for m in masks]
        out = {
            "u8": np.ascontiguousarray(arr),
            "out_hw": (oh, ow),
            "mean": self.mean,
            "std": self.std,
            "to_bgr255": self.to_bgr255,
        }
        if masks is not None:
            return out, boxes, masks
        return out, boxes


def build_fused_transforms(cfg, is_train=True):
    """Native-path variant of build_transforms (same selection logic)."""
    if is_train:
        min_size = cfg.INPUT.MIN_SIZE_TRAIN
        supp_min_size = cfg.INPUT.SUPP_MIN_SIZE_TRAIN
        max_size = cfg.INPUT.MAX_SIZE_TRAIN
        supp_max_size = cfg.INPUT.SUPP_MAX_SIZE_TRAIN
        flip_prob = 0.5
    else:
        min_size = cfg.INPUT.MIN_SIZE_TEST
        max_size = cfg.INPUT.MAX_SIZE_TEST
        supp_min_size = cfg.INPUT.SUPP_MIN_SIZE_TEST
        supp_max_size = cfg.INPUT.SUPP_MAX_SIZE_TEST
        flip_prob = 0.0
    args = (cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD, cfg.INPUT.TO_BGR255)
    return [
        FusedHostPreprocess(min_size, max_size, flip_prob, *args),
        FusedHostPreprocess(supp_min_size, supp_max_size, flip_prob, *args),
    ]


def space_to_depth(arr: "np.ndarray") -> "np.ndarray":
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel order (row-parity,
    col-parity, c). Exact rearrangement consumed by the backbone stem's
    blocked fast path (models/resnet._StemConv) — doing it in the input
    pipeline keeps the fine-grained 3-channel shuffle off the device
    critical path (measured 3.5 ms/batch8 on v5e). Same byte count.
    """
    b, h, w, c = arr.shape
    if arr.dtype == np.float32:
        from ..csrc import space_to_depth_native

        out = space_to_depth_native(arr)
        if out is not None:
            return out
    return np.ascontiguousarray(
        arr.reshape(b, h // 2, 2, w // 2, 2, c)
           .transpose(0, 1, 3, 2, 4, 5)
           .reshape(b, h // 2, w // 2, 4 * c))
