"""Dataset statistics with on-disk cache.

Replaces get_dataset_statistics (pysgg/data/build.py:27-77): fg predicate
co-occurrence matrix, pred_dist for the FrequencyBias, class name lists —
computed once from the train split and cached to
``<output_dir>/<dataset>_statistics.cache.npz``.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def compute_pred_dist(fg_matrix: np.ndarray, bg_matrix: np.ndarray, eps: float = 1e-3):
    """log-smoothed P(predicate | subj-class, obj-class) used by
    FrequencyBias (reference model_motifs.py:14-56 keyed on statistics
    'pred_dist')."""
    fg = fg_matrix.astype(np.float64)
    fg[:, :, 0] = bg_matrix
    pred_dist = np.log(fg / (fg.sum(2, keepdims=True) + eps) + eps)
    return pred_dist.astype(np.float32)


def co_occurrence_matrices(dataset, must_overlap: bool = True) -> Dict:
    """fg predicate co-occurrence + overlap-pair bg matrix over a dataset
    exposing gt_classes/gt_boxes/relationships/ind_to_* (the shared core of
    get_VG_statistics :380-413 and get_GQA_statistics)."""
    from veto_tpu.evaluation.sgg_eval import np_iou

    num_obj = len(dataset.ind_to_classes)
    num_rel = len(dataset.ind_to_predicates)
    fg = np.zeros((num_obj, num_obj, num_rel), np.int64)
    bg = np.zeros((num_obj, num_obj), np.int64)
    for i in range(len(dataset.img_info)):
        cls = dataset.gt_classes[i]
        rels = dataset.relationships[i]
        boxes = dataset.gt_boxes[i]
        for s, o, p in rels:
            fg[cls[s], cls[o], p] += 1
        iou = np_iou(boxes, boxes)
        overlap = (iou > 0) & ~np.eye(len(boxes), dtype=bool)
        if not overlap.any() or not must_overlap:
            overlap = ~np.eye(len(boxes), dtype=bool)
        for s, o in np.argwhere(overlap):
            bg[cls[s], cls[o]] += 1
    return {
        "fg_matrix": fg,
        "bg_matrix": bg,
        "obj_classes": dataset.ind_to_classes,
        "rel_classes": dataset.ind_to_predicates,
    }


def get_dataset_statistics(dataset, output_dir: str, name: str = "VG") -> Dict:
    cache = os.path.join(output_dir, f"{name}_statistics.cache.npz")
    if os.path.exists(cache):
        data = np.load(cache, allow_pickle=True)
        return {
            "fg_matrix": data["fg_matrix"],
            "bg_matrix": data["bg_matrix"],
            "pred_dist": data["pred_dist"],
            "obj_classes": list(data["obj_classes"]),
            "rel_classes": list(data["rel_classes"]),
        }
    stats = dataset.get_statistics()
    stats["pred_dist"] = compute_pred_dist(stats["fg_matrix"], stats["bg_matrix"])
    os.makedirs(output_dir, exist_ok=True)
    np.savez(
        cache,
        fg_matrix=stats["fg_matrix"],
        bg_matrix=stats["bg_matrix"],
        pred_dist=stats["pred_dist"],
        obj_classes=np.asarray(stats["obj_classes"], dtype=object),
        rel_classes=np.asarray(stats["rel_classes"], dtype=object),
    )
    return stats
