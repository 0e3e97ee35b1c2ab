"""Region Proposal Network: head + fixed-budget proposal selection.

Re-design of pysgg/modeling/rpn/rpn.py (RPNHead :73-106, RPNModule :188) and
rpn/inference.py (RPNPostProcessor :13-183).  The per-level dynamic
topk→decode→clip→NMS→topk cascade becomes one masked static program per
image: every stage has a compile-time budget (the reference's own numbers —
6000 pre-NMS, 1000 post-NMS per level, 1000 per image) and a validity mask,
so the whole RPN jit-compiles once and vmaps over the batch.

``fpn_post_nms_per_batch`` (select_over_all_levels :156-183 train branch) is
not implemented: the shipped VETO/baseline configs set
FPN_POST_NMS_PER_BATCH: False (configs/VETO_final.yaml:28), i.e. per-image
selection, which is also the behavior maskrcnn-benchmark itself calls
correct (issue #672 note at rpn/inference.py:160-162).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from veto_tpu.ops.box_ops import clip_to_image, decode_boxes, nonempty_mask
from veto_tpu.ops.nms import nms


class RPNHead(nn.Module):
    """Shared 3x3 conv + objectness / box-delta 1x1 heads (rpn.py:73-106).

    Applied to each FPN level with shared weights.  NHWC.
    """

    mid_channels: int = 256  # RPN_MID_CHANNEL (VETO_final.yaml:29)
    num_anchors: int = 4     # one size x 4 neural-motifs aspect ratios
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, features: Sequence[jnp.ndarray]
    ) -> Tuple[Tuple[jnp.ndarray, ...], Tuple[jnp.ndarray, ...]]:
        conv = nn.Conv(
            self.mid_channels, (3, 3), padding=1, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01), name="conv",
        )
        cls_logits = nn.Conv(
            self.num_anchors, (1, 1), dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01), name="cls_logits",
        )
        bbox_pred = nn.Conv(
            self.num_anchors * 4, (1, 1), dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01), name="bbox_pred",
        )
        logits, bbox = [], []
        for f in features:
            t = nn.relu(conv(f))
            logits.append(cls_logits(t))
            bbox.append(bbox_pred(t))
        return tuple(logits), tuple(bbox)


# Batch the per-level NMS walks into one vmapped walk (True) or run them
# sequentially per level (False).  Same selection either way; flipped by
# the A/B in tools/ — see BASELINE.md round-5 notes for the measurement.
RPN_BATCH_LEVELS = True


class Proposals(NamedTuple):
    boxes: jnp.ndarray       # (P, 4) xyxy, clipped to image
    objectness: jnp.ndarray  # (P,) sigmoid scores, sorted desc
    mask: jnp.ndarray        # (P,) bool


def _select_single_level(
    objectness: jnp.ndarray,      # (H*W*A,) raw logits
    box_regression: jnp.ndarray,  # (H*W*A, 4)
    anchors: jnp.ndarray,         # (H*W*A, 4)
    image_size: jnp.ndarray,      # (2,) = (w, h) of the un-padded image
    pre_nms_top_n: int,
    post_nms_top_n: int,
    nms_thresh: float,
    min_size: float,
) -> Proposals:
    """forward_for_single_feature_map (rpn/inference.py:78-125), one image.

    Semantics reference for one level; the production path
    (`rpn_select_proposals`) computes the identical selection with all
    levels' NMS walks batched into one."""
    n = objectness.shape[0]
    k = min(pre_nms_top_n, n)
    scores = jax.nn.sigmoid(objectness.astype(jnp.float32))
    top_scores, top_idx = jax.lax.top_k(scores, k)
    proposals = decode_boxes(
        box_regression[top_idx].astype(jnp.float32), anchors[top_idx],
        weights=(1.0, 1.0, 1.0, 1.0),
    )
    proposals = clip_to_image(proposals, image_size)
    valid = nonempty_mask(proposals, min_size)
    keep_idx, keep_ok = nms(
        proposals, top_scores, nms_thresh, post_nms_top_n, valid_mask=valid,
        early_exit=True,  # 6000→1000 keeps: most images finish in 2-3 of
                          # 12 block steps (exact — see _greedy_keep_sorted)
    )
    return Proposals(
        boxes=proposals[keep_idx],
        objectness=jnp.where(keep_ok, top_scores[keep_idx], 0.0),
        mask=keep_ok,
    )


def rpn_select_proposals(
    objectness: Sequence[jnp.ndarray],      # per level (H*W*A,) logits
    box_regression: Sequence[jnp.ndarray],  # per level (H*W*A, 4)
    anchors: Sequence[jnp.ndarray],         # per level (H*W*A, 4)
    image_size: jnp.ndarray,                # (2,) = (w, h)
    pre_nms_top_n: int = 6000,
    post_nms_top_n: int = 1000,
    nms_thresh: float = 0.7,
    fpn_post_nms_top_n: int = 1000,
    min_size: float = 0.0,
) -> Proposals:
    """Full per-image RPN selection (RPNPostProcessor.forward :127-154).

    Per level: topk pre-NMS → decode → clip → NMS to ``post_nms_top_n``.
    Across levels: topk ``fpn_post_nms_top_n`` by objectness
    (select_over_all_levels :156-183, per-image branch).

    vmap over the batch at the call site (anchors are shared constants).

    The per-level NMS walks are BATCHED: every level pads its pre-NMS
    candidates to the largest level's budget and one vmapped blockwise
    walk serves all levels, so the sequential block-step count is the
    max over levels instead of the sum — the walks dominated the
    cascade's rpn_propose stage (5 sequential walks → 1).
    """
    if not RPN_BATCH_LEVELS:
        per_level = [
            _select_single_level(
                o, b, a, image_size, pre_nms_top_n, post_nms_top_n,
                nms_thresh, min_size,
            )
            for o, b, a in zip(objectness, box_regression, anchors)
        ]
        boxes = jnp.concatenate([p.boxes for p in per_level])
        scores = jnp.concatenate([p.objectness for p in per_level])
        mask = jnp.concatenate([p.mask for p in per_level])
        return _final_topk(boxes, scores, mask, fpn_post_nms_top_n)

    kmax = max(min(pre_nms_top_n, o.shape[0]) for o in objectness)
    boxes_l, scores_l, valid_l = [], [], []
    for o, b, a in zip(objectness, box_regression, anchors):
        n = o.shape[0]
        k = min(pre_nms_top_n, n)
        scores = jax.nn.sigmoid(o.astype(jnp.float32))
        top_scores, top_idx = jax.lax.top_k(scores, k)
        props = decode_boxes(
            b[top_idx].astype(jnp.float32), a[top_idx],
            weights=(1.0, 1.0, 1.0, 1.0),
        )
        props = clip_to_image(props, image_size)
        valid = nonempty_mask(props, min_size)
        pad = kmax - k
        if pad:
            props = jnp.pad(props, ((0, pad), (0, 0)))
            top_scores = jnp.pad(top_scores, (0, pad), constant_values=-1.0)
            valid = jnp.pad(valid, (0, pad))
        boxes_l.append(props)
        scores_l.append(top_scores)
        valid_l.append(valid)
    boxes_l = jnp.stack(boxes_l)
    scores_l = jnp.stack(scores_l)
    valid_l = jnp.stack(valid_l)
    idx_l, ok_l = jax.vmap(
        lambda bx, sc, va: nms(bx, sc, nms_thresh, post_nms_top_n,
                               valid_mask=va, early_exit=True)
    )(boxes_l, scores_l, valid_l)
    boxes = jnp.take_along_axis(boxes_l, idx_l[..., None], axis=1
                                ).reshape(-1, 4)
    scores = jnp.where(
        ok_l, jnp.take_along_axis(scores_l, idx_l, axis=1), 0.0
    ).reshape(-1)
    mask = ok_l.reshape(-1)
    return _final_topk(boxes, scores, mask, fpn_post_nms_top_n)


def _final_topk(boxes, scores, mask, fpn_post_nms_top_n):
    """select_over_all_levels (:156-183), per-image branch."""
    k = min(fpn_post_nms_top_n, boxes.shape[0])
    masked = jnp.where(mask, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(masked, k)
    keep = top_scores > -jnp.inf
    return Proposals(
        boxes=jnp.where(keep[:, None], boxes[top_idx], 0.0),
        objectness=jnp.where(keep, scores[top_idx], 0.0),
        mask=keep,
    )


def flatten_level(objectness_map: jnp.ndarray, bbox_map: jnp.ndarray):
    """(H, W, A) & (H, W, A*4) conv outputs → ((H*W*A,), (H*W*A, 4)).

    NHWC conv output already has the anchor index fastest over row-major
    (y, x), matching the reference's permute_and_flatten(N, A, 1, H, W) →
    (N, H, W, A) ordering and ``grid_anchors``'s layout.
    """
    h, w, a = objectness_map.shape
    return objectness_map.reshape(h * w * a), bbox_map.reshape(h * w * a, 4)
