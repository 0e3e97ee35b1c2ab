"""ROI mask head (MODEL.MASK_ON): FCN extractor, predictor, loss, paste.

Re-design of the reference mask head
(pysgg/modeling/roi_heads/mask_head/{mask_head.py,loss.py,inference.py,
roi_mask_feature_extractors.py,roi_mask_predictors.py}) for TPU:

* fixed-shape masked tensors instead of per-image BoxList loops — every
  proposal keeps a row, positives are selected by weight masks;
* the GT-mask → (M, M) target projection (reference loss.py:11-42, a
  per-box CPU crop+resize loop) becomes one vmapped in-graph bilinear
  sampler over dense GT masks, bit-matching BinaryMaskList.crop's
  round+clamp box arithmetic and torch's align_corners=False resize;
* inference keeps the per-class sigmoid channel-select
  (inference.py:26-60); pasting into the image frame stays host-side
  numpy (paste_masks_in_image) exactly like the reference's Masker.

The head is config-dead for scene-graph training (MASK_ON is False in
every VETO config) but first-class for detector pretraining
(tools/detector_pretrain_net.py --mask-on).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class MaskFeatureExtractor(nn.Module):
    """MaskRCNNFPNFeatureExtractor (roi_mask_feature_extractors.py:16-65):
    a conv3x3+ReLU stack over the pooled (R, P, P, C) maps.  The Pooler
    itself lives at the model level (shared multilevel ROIAlign)."""

    conv_layers: Sequence[int] = (256, 256, 256, 256)
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled: jnp.ndarray) -> jnp.ndarray:
        x = pooled
        for i, ch in enumerate(self.conv_layers, 1):
            x = nn.Conv(
                ch, (3, 3), kernel_dilation=self.dilation,
                padding=self.dilation, dtype=self.dtype,
                kernel_init=nn.initializers.variance_scaling(
                    2.0, "fan_out", "truncated_normal"),
                name=f"mask_fcn{i}",
            )(x)
            x = nn.relu(x)
        return x


class MaskPredictor(nn.Module):
    """MaskRCNNC4Predictor (roi_mask_predictors.py:10-31): 2x2-stride-2
    transposed conv + ReLU, then 1x1 conv to per-class logits.
    Output (R, 2P, 2P, num_classes)."""

    num_classes: int = 151
    dim_reduced: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.ConvTranspose(
            self.dim_reduced, (2, 2), strides=(2, 2), dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(
                2.0, "fan_out", "truncated_normal"),
            name="conv5_mask",
        )(x)
        x = nn.relu(x)
        logits = nn.Conv(
            self.num_classes, (1, 1), dtype=jnp.float32,
            kernel_init=nn.initializers.variance_scaling(
                2.0, "fan_out", "truncated_normal"),
            name="mask_fcn_logits",
        )(x)
        return logits.astype(jnp.float32)


class MaskConv1x1Predictor(nn.Module):
    """MaskRCNNConv1x1Predictor (roi_mask_predictors.py:34-52): logits at
    the pooled resolution, no upsample."""

    num_classes: int = 151
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.num_classes, (1, 1), dtype=jnp.float32,
            kernel_init=nn.initializers.variance_scaling(
                2.0, "fan_out", "truncated_normal"),
            name="mask_fcn_logits",
        )(x).astype(jnp.float32)


def project_masks_on_boxes(
    gt_masks: jnp.ndarray,   # (T, H, W) dense instance masks (0/1 or float)
    matched_gt: jnp.ndarray,  # (P,) int — GT index per proposal
    boxes: jnp.ndarray,       # (P, 4) xyxy proposal boxes
    resolution: int,
) -> jnp.ndarray:
    """GT masks → (P, M, M) float targets, exact reference semantics.

    Reproduces project_masks_on_boxes (reference mask_head/loss.py:11-42):
    per proposal, BinaryMaskList.crop (segmentation_mask.py:116-135 —
    round each coordinate, clamp min to [0, dim-1] / max to [0, dim],
    force ≥1 px extent) followed by a bilinear resize to (M, M) with
    torch's align_corners=False half-pixel mapping.  The crop+resize
    composition is evaluated as one gather-based bilinear sample with
    clamping at the CROP boundary (edge replication inside the window),
    so it is jittable with static shapes and runs on device.
    """
    t, h, w = gt_masks.shape
    m = resolution

    def one(box, gi):
        xmin = jnp.clip(jnp.round(box[0]), 0, w - 1)
        ymin = jnp.clip(jnp.round(box[1]), 0, h - 1)
        xmax = jnp.clip(jnp.round(box[2]), 0, w)
        ymax = jnp.clip(jnp.round(box[3]), 0, h)
        xmax = jnp.maximum(xmax, xmin + 1)
        ymax = jnp.maximum(ymax, ymin + 1)
        cw = xmax - xmin
        ch = ymax - ymin
        # align_corners=False sample positions inside the crop window
        ys = (jnp.arange(m, dtype=jnp.float32) + 0.5) * (ch / m) - 0.5
        xs = (jnp.arange(m, dtype=jnp.float32) + 0.5) * (cw / m) - 0.5
        # torch clamps source indices into [0, ch-1]; weights use the
        # unclamped fractional part clipped to [0, 1]
        y0 = jnp.clip(jnp.floor(ys), 0, ch - 1)
        x0 = jnp.clip(jnp.floor(xs), 0, cw - 1)
        y1 = jnp.minimum(y0 + 1, ch - 1)
        x1 = jnp.minimum(x0 + 1, cw - 1)
        wy = jnp.clip(ys - y0, 0.0, 1.0)
        wx = jnp.clip(xs - x0, 0.0, 1.0)
        mask = gt_masks[gi].astype(jnp.float32)

        def gather(yy, xx):
            yi = (yy + ymin).astype(jnp.int32)
            xi = (xx + xmin).astype(jnp.int32)
            return mask[jnp.clip(yi, 0, h - 1)][:, jnp.clip(xi, 0, w - 1)]

        top = gather(y0, x0) * (1 - wx)[None, :] + gather(y0, x1) * wx[None, :]
        bot = gather(y1, x0) * (1 - wx)[None, :] + gather(y1, x1) * wx[None, :]
        return top * (1 - wy)[:, None] + bot * wy[:, None]

    return jax.vmap(one)(boxes.astype(jnp.float32),
                         jnp.clip(matched_gt, 0, t - 1))


class MaskLossOut(NamedTuple):
    loss: jnp.ndarray
    num_pos: jnp.ndarray


def mask_loss(
    mask_logits: jnp.ndarray,  # (P, M, M, C) per-class mask logits
    labels: jnp.ndarray,       # (P,) matched class labels (0 = bg)
    matched_gt: jnp.ndarray,   # (P,) matched GT index (-1 = none)
    gt_masks: jnp.ndarray,     # (T, H, W) dense GT instance masks
    boxes: jnp.ndarray,        # (P, 4) proposal boxes (image frame)
    valid: jnp.ndarray,        # (P,) live-proposal mask
) -> MaskLossOut:
    """MaskRCNNLossComputation.__call__ (reference mask_head/loss.py:102-128)
    on fixed shapes: project the matched GT mask of every positive
    proposal to (M, M), take the logits of the GT class channel, and
    average BCE-with-logits over positive elements only.  The reference's
    boolean subset mean equals this weighted sum / (num_pos * M * M)."""
    p, m, _, c = mask_logits.shape
    pos = (labels > 0) & (matched_gt >= 0) & valid
    targets = project_masks_on_boxes(gt_masks, matched_gt, boxes, m)
    cls_logits = jnp.take_along_axis(
        mask_logits, labels[:, None, None, None].astype(jnp.int32), axis=-1
    )[..., 0].astype(jnp.float32)
    bce = (jnp.maximum(cls_logits, 0) - cls_logits * targets
           + jnp.log1p(jnp.exp(-jnp.abs(cls_logits))))
    num_pos = pos.sum()
    total = jnp.where(pos[:, None, None], bce, 0.0).sum()
    denom = jnp.maximum(num_pos * m * m, 1)
    # empty-positive: the reference returns mask_logits.sum()*0 (:122-123)
    return MaskLossOut(loss=jnp.where(num_pos > 0, total / denom, 0.0),
                       num_pos=num_pos)


def mask_postprocess(mask_logits: jnp.ndarray,
                     labels: jnp.ndarray) -> jnp.ndarray:
    """(D, M, M, C) logits + (D,) predicted labels → (D, M, M) sigmoid
    probabilities of each detection's class channel
    (MaskPostProcessor, reference inference.py:26-60)."""
    probs = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
    return jnp.take_along_axis(
        probs, labels[:, None, None, None].astype(jnp.int32), axis=-1
    )[..., 0]


# --------------------------------------------------------------------------
# Host-side pasting (the reference Masker, inference.py:90-198) — numpy.
# --------------------------------------------------------------------------

def _expand_box(box: np.ndarray, scale: float) -> np.ndarray:
    w_half = (box[2] - box[0]) * 0.5 * scale
    h_half = (box[3] - box[1]) * 0.5 * scale
    x_c = (box[2] + box[0]) * 0.5
    y_c = (box[3] + box[1]) * 0.5
    return np.array([x_c - w_half, y_c - h_half, x_c + w_half, y_c + h_half])


def paste_mask_in_image(mask: np.ndarray, box: np.ndarray, im_h: int,
                        im_w: int, thresh: float = 0.5,
                        padding: int = 1) -> np.ndarray:
    """One (M, M) probability map → (im_h, im_w) uint8 image mask
    (reference paste_mask_in_image, inference.py:118-158): zero-pad by
    ``padding``, scale the box by (M+2p)/M, bilinear-resize to the box
    extent (+1 px TO_REMOVE convention), threshold, paste."""
    from veto_tpu.structures.masks import bilinear_resize

    m = mask.shape[-1]
    pad2 = 2 * padding
    scale = float(m + pad2) / m
    padded = np.zeros((m + pad2, m + pad2), np.float32)
    padded[padding:-padding, padding:-padding] = mask
    box = _expand_box(np.asarray(box, np.float32), scale).astype(np.int32)

    w = max(int(box[2] - box[0] + 1), 1)
    h = max(int(box[3] - box[1] + 1), 1)
    resized = bilinear_resize(padded[None], (h, w))[0]
    if thresh >= 0:
        out = (resized > thresh).astype(np.uint8)
    else:
        out = (resized * 255).astype(np.uint8)

    im_mask = np.zeros((im_h, im_w), np.uint8)
    x0, y0 = max(int(box[0]), 0), max(int(box[1]), 0)
    x1, y1 = min(int(box[2]) + 1, im_w), min(int(box[3]) + 1, im_h)
    im_mask[y0:y1, x0:x1] = out[y0 - box[1]: y1 - box[1],
                                x0 - box[0]: x1 - box[0]]
    return im_mask


def paste_masks_in_image(masks: np.ndarray, boxes: np.ndarray,
                         image_size: Tuple[int, int], thresh: float = 0.5,
                         padding: int = 1) -> np.ndarray:
    """(D, M, M) maps + (D, 4) boxes → (D, 1, H, W) pasted masks
    (Masker.forward_single_image, reference inference.py:171-182)."""
    im_w, im_h = image_size
    if len(masks) == 0:
        return np.zeros((0, 1, im_h, im_w), np.uint8)
    out = np.stack([
        paste_mask_in_image(m, b, im_h, im_w, thresh, padding)
        for m, b in zip(masks, boxes)
    ])
    return out[:, None]
