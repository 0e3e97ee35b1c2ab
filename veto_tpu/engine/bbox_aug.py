"""Detection test-time augmentation (reference engine/bbox_aug.py:1-118).

Runs the frozen detection cascade on the identity image, its horizontal
flip, and optional rescales; candidate (score, per-class box) sets are
mapped back to the identity frame, concatenated along the proposal axis,
and the standard filter_results NMS pipeline runs once on the merged set —
the reference's merge-then-filter order (:53-68).

TPU notes: each augmentation is an independent jitted program over static
shapes (one compile per scale); flips are pure array ops; the merged
filter runs on a (B, n_aug * P, ...) padded set.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from veto_tpu.models.detector.box_head import Detections, filter_decoded_boxes


def hflip_images(images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) horizontal flip (TT.RandomHorizontalFlip(1.0), :94)."""
    return images[:, :, ::-1]


def hflip_boxes(boxes: jnp.ndarray, widths: jnp.ndarray) -> jnp.ndarray:
    """Mirror xyxy boxes back to the identity frame
    (BoxList.transpose(0): x' = W - TO_REMOVE - x, bounding_box.py)."""
    w = widths.reshape(widths.shape + (1,) * (boxes.ndim - widths.ndim - 1))
    x1 = w - 1.0 - boxes[..., 2]
    x2 = w - 1.0 - boxes[..., 0]
    return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)


def detect_tta(
    model,
    variables,
    images: jnp.ndarray,       # (B, H, W, 3) identity-frame batch
    image_sizes: jnp.ndarray,  # (B, 2) = (w, h)
    hflip: bool = True,
    scales: Sequence[float] = (),
) -> Tuple[Tuple[jnp.ndarray, ...], Detections, jnp.ndarray]:
    """Returns (identity FPN features, merged Detections, predict_logits).

    The relation stage consumes the identity features; only the box set is
    augmented (as in the reference, where bbox_aug feeds detector eval).
    """

    def candidates(imgs, sizes):
        return model.apply(variables, imgs, sizes, method="detect_candidates")

    feats, prob, bpc, mask = candidates(images, image_sizes)
    probs, bpcs, masks = [prob], [bpc], [mask]

    if hflip:
        _, p_f, b_f, m_f = candidates(hflip_images(images), image_sizes)
        widths = image_sizes[:, 0].astype(jnp.float32)
        bpcs.append(hflip_boxes(b_f, widths[:, None, None]))
        probs.append(p_f)
        masks.append(m_f)

    h, w = images.shape[1:3]
    for scale in scales:
        sh, sw = int(round(h * scale)), int(round(w * scale))
        scaled = jax.image.resize(
            images, (images.shape[0], sh, sw, images.shape[3]), "linear"
        )
        s_sizes = (image_sizes.astype(jnp.float32) * scale)
        _, p_s, b_s, m_s = candidates(scaled, s_sizes)
        probs.append(p_s)
        bpcs.append(b_s / scale)  # back to identity frame
        masks.append(m_s)

    prob_all = jnp.concatenate(probs, axis=1)
    bpc_all = jnp.concatenate(bpcs, axis=1)
    mask_all = jnp.concatenate(masks, axis=1)

    dets = jax.vmap(
        lambda pr, bx, mk: filter_decoded_boxes(
            pr, bx, mk,
            score_thresh=model.box_score_thresh,
            nms_thresh=model.box_nms_thresh,
            post_nms_per_cls_topn=model.box_post_nms_per_cls_topn,
            nms_filter_duplicates=model.nms_filter_duplicates,
            detections_per_img=model.detections_per_img,
        )
    )(prob_all, bpc_all, mask_all)
    pred_logits = jnp.take_along_axis(
        jnp.log(jnp.clip(prob_all, 1e-12)), dets.orig_idx[..., None], axis=1
    )
    return feats, dets, pred_logits
