"""ROI keypoint head (MODEL.KEYPOINT_ON): convs, deconv predictor, loss.

Re-design of the reference keypoint head
(pysgg/modeling/roi_heads/keypoint_head/{keypoint_head.py,loss.py,
inference.py,roi_keypoint_feature_extractors.py,roi_keypoint_predictors.py})
for TPU fixed shapes:

* KeypointRCNNFeatureExtractor's conv stack over the shared pooled maps;
* KeypointRCNNPredictor: 4x4-stride-2 deconv to K heatmap channels, then
  a 2x bilinear upsample (align_corners=False);
* loss: the C2 heatmap projection (structures/keypoints.py
  keypoints_to_heat_map) + spatial softmax cross-entropy over valid
  keypoints only (reference keypoint_head/loss.py:145-169) — the
  reference's nonzero()-gathered subset mean becomes a masked weighted
  mean, exactly equal for the same validity set;
* inference: heatmaps_to_keypoints stays host-side numpy with cv2 cubic
  per-roi resize, matching the reference (inference.py:40-94).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from veto_tpu.structures.keypoints import keypoints_to_heat_map


class KeypointFeatureExtractor(nn.Module):
    """KeypointRCNNFeatureExtractor conv stack
    (roi_keypoint_feature_extractors.py:11-43)."""

    conv_layers: Sequence[int] = tuple(512 for _ in range(8))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled: jnp.ndarray) -> jnp.ndarray:
        x = pooled
        for i, ch in enumerate(self.conv_layers, 1):
            x = nn.Conv(
                ch, (3, 3), padding=1, dtype=self.dtype,
                kernel_init=nn.initializers.variance_scaling(
                    2.0, "fan_out", "truncated_normal"),
                name=f"conv_fcn{i}",
            )(x)
            x = nn.relu(x)
        return x


def _upsample_bilinear_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample, align_corners=False (torch interpolate)."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="bilinear")


class KeypointPredictor(nn.Module):
    """KeypointRCNNPredictor (roi_keypoint_predictors.py:8-33):
    ConvTranspose(kernel 4, stride 2, padding 1) to ``num_keypoints``
    heatmap channels, then a further 2x bilinear upsample."""

    num_keypoints: int = 17
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # flax ConvTranspose padding semantics differ from torch: torch's
        # ConvTranspose2d(k=4, s=2, p=1) on H gives 2H; flax "SAME" with
        # k=4 s=2 also gives 2H with the matching implicit cropping
        x = nn.ConvTranspose(
            self.num_keypoints, (4, 4), strides=(2, 2), padding="SAME",
            dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(
                2.0, "fan_out", "truncated_normal"),
            name="kps_score_lowres",
        )(x)
        return _upsample_bilinear_2x(x.astype(jnp.float32))


class KeypointLossOut(NamedTuple):
    loss: jnp.ndarray
    num_valid: jnp.ndarray


def keypoint_loss(
    kp_logits: jnp.ndarray,   # (P, H, H, K) heatmap logits
    keypoints: jnp.ndarray,   # (P, K, 3) matched GT keypoints (image frame)
    boxes: jnp.ndarray,       # (P, 4) proposal boxes
    pos: jnp.ndarray,         # (P,) positive-proposal mask
) -> KeypointLossOut:
    """KeypointRCNNLossComputation.__call__ (keypoint_head/loss.py:145-169):
    project GT keypoints to per-roi heatmap cells, then cross-entropy over
    the H*H spatial positions of each valid (proposal, keypoint) pair.
    The reference's ``nonzero()`` subset mean equals this masked mean."""
    p, hm, _, k = kp_logits.shape
    targets, valid = keypoints_to_heat_map(keypoints, boxes, hm)
    valid = valid.astype(bool) & pos[:, None]

    logits = kp_logits.astype(jnp.float32).reshape(p, hm * hm, k)
    logits = jnp.swapaxes(logits, 1, 2).reshape(p * k, hm * hm)
    tgt = targets.reshape(p * k)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[:, None].astype(jnp.int32),
                               axis=1)[:, 0]
    v = valid.reshape(p * k)
    num_valid = v.sum()
    loss = jnp.where(v, nll, 0.0).sum() / jnp.maximum(num_valid, 1)
    # empty-valid: reference returns kp_logits.sum() * 0 (:162-163)
    return KeypointLossOut(loss=jnp.where(num_valid > 0, loss, 0.0),
                           num_valid=num_valid)


def heatmaps_to_keypoints(maps: np.ndarray,
                          rois: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(D, K, H, H) heatmaps + (D, 4) rois → ((D, K, 3) xy+vis, (D, K)
    scores), host-side — exact reference heatmaps_to_keypoints
    (keypoint_head/inference.py:40-94): per-roi cv2 INTER_CUBIC resize to
    the ceil box extent, argmax per channel, Heckbert +0.5 continuous
    mapping."""
    import cv2

    offset_x = rois[:, 0]
    offset_y = rois[:, 1]
    widths = np.maximum(rois[:, 2] - rois[:, 0], 1)
    heights = np.maximum(rois[:, 3] - rois[:, 1], 1)
    widths_ceil = np.ceil(widths)
    heights_ceil = np.ceil(heights)

    maps = np.transpose(maps, [0, 2, 3, 1])
    num_k = maps.shape[3]
    xy_preds = np.zeros((len(rois), 3, num_k), np.float32)
    end_scores = np.zeros((len(rois), num_k), np.float32)
    for i in range(len(rois)):
        rw, rh = int(widths_ceil[i]), int(heights_ceil[i])
        width_correction = widths[i] / rw
        height_correction = heights[i] / rh
        roi_map = cv2.resize(maps[i], (rw, rh),
                             interpolation=cv2.INTER_CUBIC)
        if roi_map.ndim == 2:
            roi_map = roi_map[:, :, None]
        roi_map = np.transpose(roi_map, [2, 0, 1])
        w = roi_map.shape[2]
        pos = roi_map.reshape(num_k, -1).argmax(axis=1)
        x_int = pos % w
        y_int = (pos - x_int) // w
        xy_preds[i, 0] = (x_int + 0.5) * width_correction + offset_x[i]
        xy_preds[i, 1] = (y_int + 0.5) * height_correction + offset_y[i]
        xy_preds[i, 2] = 1
        end_scores[i] = roi_map[np.arange(num_k), y_int, x_int]
    return np.transpose(xy_preds, [0, 2, 1]), end_scores
