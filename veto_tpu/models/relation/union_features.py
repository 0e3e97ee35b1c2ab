"""Union-box features for the legacy (non-VETO) relation predictors.

Re-design of RelationFeatureExtractor
(pysgg/.../roi_relation_feature_extractors.py:14-132): for each sampled pair
the union of subject/object boxes is pooled from the FPN pyramid at 7x7, a
2-channel rasterized rect-mask pair (27x27) runs through a small conv stack,
both are summed and pushed through the box head's fc6/fc7 MLP.

Batched/padded layout: (B, P) pairs over (B, N) proposals.  The rect masks
are built with closed-form comparisons instead of the reference's per-image
loops; BatchNorms use momentum 0.01 like the reference rect_conv.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from veto_tpu.ops.box_ops import box_union, resize_boxes
from veto_tpu.ops.roi_align_windowed import multilevel_roi_align_batched


def union_boxes(
    boxes: jnp.ndarray, pair_idx: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-pair (union, head, tail) boxes; boxes (N, 4), pair_idx (P, 2)."""
    head = boxes[pair_idx[:, 0]]
    tail = boxes[pair_idx[:, 1]]
    return box_union(head, tail), head, tail


def rect_masks(
    head: jnp.ndarray,      # (P, 4) in image coords
    tail: jnp.ndarray,
    image_size: jnp.ndarray,  # (2,) = (w, h)
    rect_size: int = 27,      # resolution * 4 - 1 (:41)
) -> jnp.ndarray:
    """(P, rect_size, rect_size, 2) rasterized subject/object rectangles
    (roi_relation_feature_extractors.py:78-100): boxes resized onto the
    rect grid, grid cell (y, x) is inside iff floor(x1) <= x <= ceil(x2)."""
    size = jnp.asarray([rect_size, rect_size], jnp.float32)

    def one(b):
        b = resize_boxes(b, image_size.astype(jnp.float32), size)
        xs = jnp.arange(rect_size, dtype=jnp.float32)[None, None, :]
        ys = jnp.arange(rect_size, dtype=jnp.float32)[None, :, None]
        x1 = jnp.floor(b[:, 0])[:, None, None]
        x2 = jnp.ceil(b[:, 2])[:, None, None]
        y1 = jnp.floor(b[:, 1])[:, None, None]
        y2 = jnp.ceil(b[:, 3])[:, None, None]
        return ((xs >= x1) & (xs <= x2) & (ys >= y1) & (ys <= y2)).astype(jnp.float32)

    return jnp.stack([one(head), one(tail)], axis=-1)


class UnionFeatureExtractor(nn.Module):
    """Union pooling + rect conv + fc6/fc7 → (B, P, mlp_dim)."""

    pooler_resolution: int = 7
    pooler_scales: Tuple[float, ...] = (0.25, 0.125, 0.0625, 0.03125)
    pooler_sampling_ratio: int = 2
    pooler_impl: str = "auto"
    # union boxes (pair bounding boxes) have a fatter extreme-aspect tail
    # than detections, so the windowed pooler gets a larger exact-fallback
    # budget here than the box-head default
    pooler_fallback_budget: int = 256
    mlp_dim: int = 4096
    in_channels: int = 256
    geometry: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats,                     # FPN maps, (B, H, W, C) each
        boxes: jnp.ndarray,        # (B, N, 4)
        pair_idx: jnp.ndarray,     # (B, P, 2)
        image_sizes: jnp.ndarray,  # (B, 2) = (w, h)
        train: bool = False,
    ) -> jnp.ndarray:
        rect_size = self.pooler_resolution * 4 - 1

        ub, head, tail = jax.vmap(union_boxes)(boxes, pair_idx)
        pooled = multilevel_roi_align_batched(
            tuple(feats)[: len(self.pooler_scales)], ub, self.pooler_scales,
            self.pooler_resolution, self.pooler_sampling_ratio,
            impl=self.pooler_impl,
            fallback_budget=self.pooler_fallback_budget,
        )  # (B, P, 7, 7, C)

        if self.geometry:
            rects = jax.vmap(
                lambda h, t, s: rect_masks(h, t, s, rect_size)
            )(head, tail, image_sizes.astype(jnp.float32))  # (B, P, 27, 27, 2)
            b, p = rects.shape[:2]
            x = rects.reshape(b * p, rect_size, rect_size, 2).astype(self.dtype)
            # rect conv stack (:44-54): conv7s2 → relu → BN → maxpool3s2 →
            # conv3 → relu → BN; output spatial = pooler_resolution
            x = nn.Conv(self.in_channels // 2, (7, 7), strides=2, padding=3,
                        dtype=self.dtype, name="rect_conv1")(x)
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             dtype=self.dtype, name="rect_bn1")(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
            x = nn.Conv(self.in_channels, (3, 3), padding=1, dtype=self.dtype,
                        name="rect_conv2")(x)
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             dtype=self.dtype, name="rect_bn2")(x)
            rect_feats = x.reshape(b, p, *x.shape[1:])
            pooled = pooled.astype(self.dtype) + rect_feats

        flat = pooled.reshape(pooled.shape[:2] + (-1,))
        y = nn.relu(nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc6")(flat))
        y = nn.relu(nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc7")(y))
        return y
