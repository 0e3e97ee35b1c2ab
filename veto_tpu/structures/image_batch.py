"""Padded image batches.

Replaces the reference's ``ImageList``/``to_image_list``
(pysgg/structures/image_list.py:7,29): a batch of images zero-padded to a
common (H, W) rounded up to ``size_divisibility``.  For TPU we additionally
bucket target shapes host-side (data/loader.py) so each bucket compiles once.

Layout is NHWC — the TPU-native convolution layout.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class ImageBatch:
    """Batched padded images.

    Attributes:
      tensors: (B, H, W, C) float array, zero-padded.
      sizes: (B, 2) int array of per-image (width, height) before padding.
    """

    tensors: jnp.ndarray
    sizes: jnp.ndarray

    @property
    def batch_size(self) -> int:
        return self.tensors.shape[0]

    @property
    def padded_hw(self) -> Tuple[int, int]:
        return self.tensors.shape[1], self.tensors.shape[2]


def to_image_batch(
    images: Sequence[np.ndarray],
    size_divisibility: int = 32,
    target_hw: Tuple[int, int] = None,
) -> ImageBatch:
    """Host-side: stack HWC numpy images, zero-padding to a shared shape.

    If ``target_hw`` is given (bucketed loading) it is used directly; else the
    max over the batch rounded up to ``size_divisibility`` (reference
    image_list.py:54-61).
    """
    if target_hw is None:
        max_h = max(im.shape[0] for im in images)
        max_w = max(im.shape[1] for im in images)
        if size_divisibility > 0:
            d = size_divisibility
            max_h = int(np.ceil(max_h / d) * d)
            max_w = int(np.ceil(max_w / d) * d)
        target_hw = (max_h, max_w)
    h, w = target_hw
    c = images[0].shape[2]
    batch = np.zeros((len(images), h, w, c), dtype=np.float32)
    sizes = np.zeros((len(images), 2), dtype=np.int32)
    for i, im in enumerate(images):
        ih, iw = im.shape[:2]
        if ih > h or iw > w:
            raise ValueError(f"image {im.shape} exceeds bucket {target_hw}")
        batch[i, :ih, :iw] = im
        sizes[i] = (iw, ih)  # (width, height) like BoxList.size
    return ImageBatch(tensors=jnp.asarray(batch), sizes=jnp.asarray(sizes))
