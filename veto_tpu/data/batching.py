"""Host-side batch assembly: ragged per-image records → fixed-shape SGGBatch.

Replaces the reference BatchCollator + ImageList padding
(pysgg/data/collate_batch.py:5-24, structures/image_list.py:29-72): images
zero-pad to the bucket shape (divisible by 32, reference SIZE_DIVISIBILITY),
boxes/labels pad to the static box budget, relations arrive as a dense
(N, N) predicate matrix.  All NumPy; the jitted step sees one shape.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from veto_tpu.engine.batch import SGGBatch


def pad_to_budget(arr: np.ndarray, budget: int, fill=0) -> np.ndarray:
    """Pad (n, ...) to (budget, ...), truncating if over."""
    n = min(arr.shape[0], budget)
    out = np.full((budget,) + arr.shape[1:], fill, dtype=arr.dtype)
    out[:n] = arr[:n]
    return out


def make_sgg_batch(
    records: Sequence[Dict],
    image_shape: tuple,
    max_boxes: int,
    num_obj_classes: int = 151,
    pixel_arrays=None,
) -> SGGBatch:
    """Assemble a batch from per-image record dicts.

    Each record: image (H, W, 3) float32, depth (H, W, 1) float32,
    boxes (n, 4), labels (n,), rel_matrix (n, n), size (2,) = (w, h).

    ``pixel_arrays``: optional (images, depth) preallocated (B, H, W, C)
    arrays already filled by the loader's fused native path — the
    per-image pixel copies are skipped (records then carry no
    image/depth).
    """
    b = len(records)
    h, w = image_shape
    if pixel_arrays is not None:
        images, depth = pixel_arrays
    else:
        images = np.zeros((b, h, w, 3), np.float32)
        depth = np.zeros((b, h, w, 1), np.float32)
    boxes = np.zeros((b, max_boxes, 4), np.float32)
    box_mask = np.zeros((b, max_boxes), bool)
    labels = np.zeros((b, max_boxes), np.int32)
    rel_matrix = np.zeros((b, max_boxes, max_boxes), np.int32)
    sizes = np.zeros((b, 2), np.int32)
    attributes = np.zeros((b, max_boxes, 10), np.int32)

    for i, rec in enumerate(records):
        if pixel_arrays is None:
            img = rec["image"]
            ih, iw = img.shape[:2]
            images[i, :ih, :iw] = img
            if rec.get("depth") is not None:
                depth[i, :ih, :iw] = rec["depth"]
        n = min(len(rec["boxes"]), max_boxes)
        boxes[i, :n] = rec["boxes"][:n]
        box_mask[i, :n] = True
        labels[i, :n] = rec["labels"][:n]
        rel_matrix[i, :n, :n] = rec["rel_matrix"][:n, :n]
        sizes[i] = rec["size"]
        attrs = rec.get("attributes")
        if attrs is not None and len(attrs):
            k = min(np.asarray(attrs).shape[1], 10)
            attributes[i, :n, :k] = np.asarray(attrs)[:n, :k]

    # dense GT masks / keypoints ride along only when a record carries them
    # (MODEL.MASK_ON / KEYPOINT_ON detector pretraining)
    masks = None
    if any(rec.get("masks") is not None for rec in records):
        masks = np.zeros((b, max_boxes, h, w), np.float32)
        for i, rec in enumerate(records):
            rm = rec.get("masks")
            if rm is not None and len(rm):
                n = min(len(rm), max_boxes)
                ih, iw = rm.shape[1:3]
                masks[i, :n, :ih, :iw] = rm[:n]
    keypoints = None
    if any(rec.get("keypoints") is not None for rec in records):
        nk = max(rec["keypoints"].shape[1] for rec in records
                 if rec.get("keypoints") is not None)
        keypoints = np.zeros((b, max_boxes, nk, 3), np.float32)
        for i, rec in enumerate(records):
            rk = rec.get("keypoints")
            if rk is not None and len(rk):
                n = min(len(rk), max_boxes)
                keypoints[i, :n] = rk[:n]

    # predcls: detector logits are the GT one-hot (relation_head.py:104-111
    # overloads predict_logits with to_onehot(labels))
    eye = np.eye(num_obj_classes, dtype=np.float32)
    obj_logits = eye[labels] * box_mask[..., None]

    return SGGBatch(
        images=images, depth=depth, boxes=boxes, box_mask=box_mask,
        labels=labels, obj_logits=obj_logits, rel_matrix=rel_matrix,
        sizes=sizes, attributes=attributes, masks=masks, keypoints=keypoints,
    )
