"""RetinaNet one-stage detector (legacy alternative to the FPN RPN+box head).

Re-design of the reference RetinaNet stack
(pysgg/modeling/rpn/retinanet/{retinanet.py,loss.py,inference.py} and
make_anchor_generator_retinanet, anchor_generator.py:146-166) on TPU
semantics: every stage is fixed-shape — matching runs as one dense IoU
matrix per image, inference takes a masked top-k per level instead of the
reference's boolean-indexed per-image loops, and the per-class NMS is the
coordinate-offset batched kernel.  vmap over the batch, jit over the whole
forward.

Geometry: FPN levels P3..P7 (strides 8..128).  P6/P7 come from 3x3/s2
convs on C5 (USE_C5, retinanet.py builder) with a ReLU between them, not
the RPN FPN's maxpool.  Anchors are the caffe2 recipe with octave scale
enumeration: 3 scales/octave x 3 ratios = 9 anchors/cell
(defaults.py:644-696 for every constant used here).
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from veto_tpu.ops.box_ops import clip_to_image, decode_boxes, encode_boxes
from veto_tpu.ops.losses import sigmoid_focal_loss
from veto_tpu.ops.nms import batched_nms

from .losses import BETWEEN, match_boxes, smooth_l1

RETINANET_COMBO_WEIGHTS = (10.0, 10.0, 5.0, 5.0)  # BoxCoder(retinanet.py:103)


def retinanet_anchor_sizes(
    sizes: Sequence[int] = (32, 64, 128, 256, 512),
    octave: float = 2.0,
    scales_per_octave: int = 3,
) -> Tuple[Tuple[float, ...], ...]:
    """Per-level anchor-size tuples with octave enumeration
    (anchor_generator.py:155-161); feed to fpn_anchors with strides
    (8, 16, 32, 64, 128)."""
    return tuple(
        tuple(size * octave ** (i / scales_per_octave)
              for i in range(scales_per_octave))
        for size in sizes
    )


class RetinaNetFPN(nn.Module):
    """(C3, C4, C5) -> (P3, P4, P5, P6, P7).

    Reference build_resnet_fpn_p3p7_backbone: FPN over C3-C5 plus
    LastLevelP6P7 — P6 = conv3x3/s2(C5) (USE_C5), P7 = conv3x3/s2(relu(P6)).
    """

    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"fpn_inner{i + 1}")(c)
            for i, c in enumerate(inputs)
        ]
        merged = [laterals[-1]]
        for lat in reversed(laterals[:-1]):
            top = merged[0]
            b, h, w, c = top.shape
            top = jnp.broadcast_to(
                top[:, :, None, :, None, :], (b, h, 2, w, 2, c)
            ).reshape(b, h * 2, w * 2, c)[:, : lat.shape[1], : lat.shape[2], :]
            merged.insert(0, lat + top)
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"fpn_layer{i + 1}")(m)
            for i, m in enumerate(merged)
        ]
        c5 = inputs[-1]
        p6 = nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                     dtype=self.dtype, name="p6")(c5)
        p7 = nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                     dtype=self.dtype, name="p7")(nn.relu(p6))
        return tuple(outs) + (p6, p7)


class RetinaNetHead(nn.Module):
    """Shared 4-conv cls/bbox towers + A*C / A*4 prediction convs
    (retinanet.py:13-87).  Channel layout anchor-major / class-fastest,
    matching the reference's view(N, A, C, H, W)."""

    num_classes: int = 80          # foreground classes (NUM_CLASSES - 1)
    num_anchors: int = 9           # ratios x scales_per_octave
    num_convs: int = 4
    prior_prob: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        init = nn.initializers.normal(0.01)
        cls_tower = [
            nn.Conv(features[0].shape[-1], (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=init, name=f"cls_tower{i}")
            for i in range(self.num_convs)
        ]
        bbox_tower = [
            nn.Conv(features[0].shape[-1], (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=init, name=f"bbox_tower{i}")
            for i in range(self.num_convs)
        ]
        bias_value = -math.log((1 - self.prior_prob) / self.prior_prob)
        cls_logits = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3), padding=1,
            dtype=self.dtype, kernel_init=init,
            bias_init=nn.initializers.constant(bias_value), name="cls_logits",
        )
        bbox_pred = nn.Conv(
            self.num_anchors * 4, (3, 3), padding=1, dtype=self.dtype,
            kernel_init=init, name="bbox_pred",
        )
        logits, bbox = [], []
        for f in features:
            t = f
            for conv in cls_tower:
                t = nn.relu(conv(t))
            logits.append(cls_logits(t))
            t = f
            for conv in bbox_tower:
                t = nn.relu(conv(t))
            bbox.append(bbox_pred(t))
        return tuple(logits), tuple(bbox)


def flatten_retinanet_level(cls_map: jnp.ndarray, reg_map: jnp.ndarray,
                            num_classes: int):
    """(H, W, A*C) / (H, W, A*4) -> ((H*W*A, C), (H*W*A, 4)) in grid-anchor
    order (y, x, anchor) — the permute_and_flatten layout (utils.py:12-23)."""
    h, w, _ = cls_map.shape
    cls = cls_map.reshape(h * w, -1, num_classes).reshape(-1, num_classes)
    reg = reg_map.reshape(h * w, -1, 4).reshape(-1, 4)
    return cls, reg


class RetinaNetLoss(NamedTuple):
    cls: jnp.ndarray
    reg: jnp.ndarray


def retinanet_losses(
    box_cls: jnp.ndarray,      # (B, A, C) raw logits, all levels concat
    box_reg: jnp.ndarray,      # (B, A, 4)
    anchors: jnp.ndarray,      # (A, 4) shared across the batch
    gt_boxes: jnp.ndarray,     # (B, T, 4)
    gt_labels: jnp.ndarray,    # (B, T) 1-based class ids
    gt_mask: jnp.ndarray,      # (B, T)
    fg_iou: float = 0.5,
    bg_iou: float = 0.4,
    reg_beta: float = 0.11,
    regress_norm: float = 4.0,  # BBOX_REG_WEIGHT
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> RetinaNetLoss:
    """Batch RetinaNet loss (loss.py:43-81).

    The reference concatenates images before normalizing, so both
    normalizers are global: cls / (total_pos + B), reg / max(1,
    total_pos * regress_norm).  Matching discards only between-threshold
    anchors (discard_cases=['between_thresholds']; visibility is not
    enforced, unlike the RPN loss).
    """
    b, a, _ = box_cls.shape
    ones = jnp.ones((a,), bool)

    def match_one(gb, gm):
        m = match_boxes(anchors, ones, gb, gm, fg_iou, bg_iou,
                        allow_low_quality=True)
        # no valid GT in the image ⇒ match_boxes saw an all -1 IoU matrix;
        # everything stays background via the BELOW_LOW branch
        return m

    matches = jax.vmap(match_one)(gt_boxes, gt_mask)          # (B, A)
    pos = matches >= 0
    safe = jnp.maximum(matches, 0)
    labels = jnp.where(
        pos,
        jnp.take_along_axis(gt_labels, safe, axis=1),
        jnp.where(matches == BETWEEN, -1, 0),
    )                                                          # (B, A)

    total_pos = pos.sum()
    cls = sigmoid_focal_loss(
        box_cls.reshape(b * a, -1), labels.reshape(-1), gamma, alpha
    ).sum() / (total_pos + b).astype(jnp.float32)

    matched_gt = jnp.take_along_axis(
        gt_boxes, safe[..., None], axis=1)                     # (B, A, 4)
    targets = jax.vmap(
        lambda g: encode_boxes(g, anchors, RETINANET_COMBO_WEIGHTS)
    )(matched_gt)
    reg = jnp.where(
        pos[..., None],
        smooth_l1(box_reg.astype(jnp.float32) - targets, beta=reg_beta),
        0.0,
    ).sum() / jnp.maximum(1.0, total_pos * regress_norm)
    return RetinaNetLoss(cls=cls, reg=reg)


class RetinaNetDetections(NamedTuple):
    boxes: jnp.ndarray    # (D, 4)
    scores: jnp.ndarray   # (D,)
    labels: jnp.ndarray   # (D,) 1-based
    mask: jnp.ndarray     # (D,)


def retinanet_inference(
    box_cls: Sequence[jnp.ndarray],   # per level (H_l*W_l*A, C) raw logits
    box_reg: Sequence[jnp.ndarray],   # per level (H_l*W_l*A, 4)
    anchors: Sequence[jnp.ndarray],   # per level (H_l*W_l*A, 4)
    image_size,                       # (w, h)
    pre_nms_thresh: float = 0.05,
    pre_nms_top_n: int = 1000,
    nms_thresh: float = 0.4,
    detections_per_img: int = 100,
    num_classes: int = 80,
) -> RetinaNetDetections:
    """Single-image inference (inference.py:59-175), fixed shapes.

    Per level: sigmoid scores thresholded at INFERENCE_TH, masked top-N
    over the flattened (anchor, class) axis, decode against the anchors.
    Across levels: per-class NMS (offset trick ≡ the reference's per-class
    boxlist_nms loop) keeping the DETECTIONS_PER_IMG best overall.
    """
    all_boxes, all_scores, all_labels, all_valid = [], [], [], []
    for cls_l, reg_l, anc_l in zip(box_cls, box_reg, anchors):
        scores = jax.nn.sigmoid(cls_l.astype(jnp.float32))     # (HWA, C)
        cand = scores > pre_nms_thresh
        flat = jnp.where(cand, scores, 0.0).reshape(-1)        # (HWA*C,)
        k = min(pre_nms_top_n, flat.shape[0])
        top_scores, top_idx = jax.lax.top_k(flat, k)
        box_loc = top_idx // num_classes
        cls_id = top_idx % num_classes + 1
        decoded = decode_boxes(reg_l[box_loc].astype(jnp.float32),
                               anc_l[box_loc], RETINANET_COMBO_WEIGHTS)
        decoded = clip_to_image(decoded, image_size)
        all_boxes.append(decoded)
        all_scores.append(top_scores)
        all_labels.append(cls_id)
        all_valid.append(cand.reshape(-1)[top_idx])
    boxes = jnp.concatenate(all_boxes)
    scores = jnp.concatenate(all_scores)
    labels = jnp.concatenate(all_labels)
    valid = jnp.concatenate(all_valid)
    keep_idx, keep_mask = batched_nms(
        boxes, scores, labels, nms_thresh, detections_per_img,
        valid_mask=valid,
    )
    return RetinaNetDetections(
        boxes=boxes[keep_idx], scores=scores[keep_idx],
        labels=labels[keep_idx], mask=keep_mask,
    )
