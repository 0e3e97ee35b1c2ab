"""The device-side batch pytree.

Fixed-shape, mask-carrying replacement for the reference's
(ImageList, list[BoxList], depth ImageList) batch triple
(pysgg/data/collate_batch.py:5-24).  Every array has a static shape so one
jitted step serves the whole run; the data loader pads into these budgets.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class SGGBatch:
    images: jnp.ndarray      # (B, H, W, 3) float32, BGR*255 normalized
    depth: jnp.ndarray       # (B, H, W, 1) float32, per-image standardized
    boxes: jnp.ndarray       # (B, N, 4) xyxy in padded-image pixel coords
    box_mask: jnp.ndarray    # (B, N) bool
    labels: jnp.ndarray      # (B, N) int32 object class labels (0 = bg/pad)
    obj_logits: jnp.ndarray  # (B, N, num_obj) detector logits (predcls: one-hot)
    rel_matrix: jnp.ndarray  # (B, N, N) int32 GT predicate matrix (0 = none)
    sizes: jnp.ndarray       # (B, 2) int32 (width, height) before padding
    # (B, N, 10) int32 padded per-box attribute-id lists (0 = none);
    # zeros when the dataset carries no attributes (MODEL.ATTRIBUTE_ON)
    attributes: jnp.ndarray = None
    # (B, N, Hm, Wm) float32 dense per-instance GT masks in padded-image
    # pixel coords (MODEL.MASK_ON detector pretraining); None otherwise
    masks: jnp.ndarray = None
    # (B, N, K, 3) float32 [x, y, visibility] GT keypoints
    # (MODEL.KEYPOINT_ON); None otherwise
    keypoints: jnp.ndarray = None

    @property
    def batch_size(self) -> int:
        return self.images.shape[0]
