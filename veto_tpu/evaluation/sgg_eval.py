"""Scene-graph-generation metrics (host-side NumPy).

A from-scratch reimplementation of the metric *math* of the reference's
evaluator stack (pysgg/data/datasets/evaluation/vg/sgg_eval.py:119-582 and
the per-image driver vg_eval.py:459-583), restructured as one stateful
``SGGEvaluator`` instead of nine result-dict-sharing classes.

Metrics covered (same definitions, verified by golden tests):
  * R@K            — graph-constraint triplet recall (SGRecall)
  * per-class mR@K — mean recall (SGMeanRecall, CVPR'19 VCTree)
  * ngR@K / ng-mR@K— no-graph-constraint variants (SGNoGraphConstraintRecall,
                     SGNGMeanRecall): top-100 over all pair×predicate scores
  * zR@K           — zero-shot recall over unseen (s-class, o-class, p) triples
  * A@K            — pair accuracy on GT pairs (SGPairAccuracy; predcls/sgcls)

Evaluation is deliberately NumPy on host: per-image outputs are small and
ragged, and the reference's own eval is single-process NumPy (SURVEY.md §3.2).
The device side only has to hand over padded arrays; `add_image` takes the
valid prefixes.

Matching semantics preserved exactly:
  * predictions must arrive sorted by triple score (the relation
    post-processor's job) — R@K truncates that order
  * triplet equality + per-part IoU >= iou_thres (inclusive-pixel IoU)
  * phrdet mode matches on the union box instead
  * predcls overrides pred boxes/classes with GT and obj_scores with ones
    (vg_eval.py:512-517)
"""

from __future__ import annotations

from functools import reduce
from typing import Dict, List, Optional, Sequence

import numpy as np


# ----------------------------------------------------------------------
# numpy helpers (reference pysgg/utils/miscellaneous.py:47-86)
# ----------------------------------------------------------------------
def intersect_2d(x1: np.ndarray, x2: np.ndarray) -> np.ndarray:
    """Row-wise equality matrix: (m1, n) × (m2, n) → (m1, m2) bool."""
    if x1.shape[1] != x2.shape[1]:
        raise ValueError("inputs must share the column count")
    return (x1[:, None, :] == x2[None, :, :]).all(-1)


def argsort_desc(scores: np.ndarray) -> np.ndarray:
    """Indices of a descending flat sort, unraveled to per-dim columns."""
    return np.column_stack(np.unravel_index(np.argsort(-scores.ravel()), scores.shape))


def np_iou(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """Pairwise IoU with the inclusive-pixel (+1) convention."""
    area1 = (boxes1[:, 2] - boxes1[:, 0] + 1) * (boxes1[:, 3] - boxes1[:, 1] + 1)
    area2 = (boxes2[:, 2] - boxes2[:, 0] + 1) * (boxes2[:, 3] - boxes2[:, 1] + 1)
    lt = np.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = np.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = np.clip(rb - lt + 1, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area1[:, None] + area2[None, :] - inter)


# ----------------------------------------------------------------------
# triplet matching kernel (reference sgg_eval.py:44-116)
# ----------------------------------------------------------------------
def make_triplets(
    relations: np.ndarray,
    classes: np.ndarray,
    boxes: np.ndarray,
    predicate_scores: Optional[np.ndarray] = None,
    class_scores: Optional[np.ndarray] = None,
):
    """(s_idx, o_idx, p) relations → (s_cls, p, o_cls) triplets + box pairs."""
    sub, obj, pred = relations[:, 0], relations[:, 1], relations[:, 2]
    triplets = np.column_stack((classes[sub], pred, classes[obj]))
    triplet_boxes = np.column_stack((boxes[sub], boxes[obj]))
    scores = None
    if predicate_scores is not None and class_scores is not None:
        scores = np.column_stack(
            (class_scores[sub], predicate_scores, class_scores[obj])
        )
    return triplets, triplet_boxes, scores


def match_triplets(
    gt_triplets: np.ndarray,
    pred_triplets: np.ndarray,
    gt_boxes: np.ndarray,
    pred_boxes: np.ndarray,
    iou_thres: float,
    phrdet: bool = False,
) -> List[List[int]]:
    """For each prediction, the list of GT relation indices it matches.

    A match requires label-triplet equality and subject & object IoU >=
    ``iou_thres`` (or union-box IoU in phrdet mode).
    """
    keeps = intersect_2d(gt_triplets, pred_triplets)
    pred_to_gt: List[List[int]] = [[] for _ in range(pred_boxes.shape[0])]
    for gt_ind in np.where(keeps.any(1))[0]:
        gt_box = gt_boxes[gt_ind]
        keep_inds = keeps[gt_ind]
        boxes = pred_boxes[keep_inds]
        if phrdet:
            gt_u = np.concatenate(
                (gt_box.reshape(2, 4).min(0)[:2], gt_box.reshape(2, 4).max(0)[2:])
            )
            pred_u = np.concatenate(
                (
                    boxes.reshape(-1, 2, 4).min(1)[:, :2],
                    boxes.reshape(-1, 2, 4).max(1)[:, 2:],
                ),
                axis=1,
            )
            ok = np_iou(gt_u[None], pred_u)[0] >= iou_thres
        else:
            sub_iou = np_iou(gt_box[None, :4], boxes[:, :4])[0]
            obj_iou = np_iou(gt_box[None, 4:], boxes[:, 4:])[0]
            ok = (sub_iou >= iou_thres) & (obj_iou >= iou_thres)
        for i in np.where(keep_inds)[0][ok]:
            pred_to_gt[i].append(int(gt_ind))
    return pred_to_gt


def _union_upto(pred_to_gt: Sequence[Sequence[int]], k: int) -> np.ndarray:
    if len(pred_to_gt) == 0:
        return np.array([], dtype=np.int64)
    return reduce(np.union1d, pred_to_gt[:k]) if k > 0 else np.array([])


# ----------------------------------------------------------------------
# the evaluator
# ----------------------------------------------------------------------
class SGGEvaluator:
    """Accumulates per-image SGG statistics and aggregates them.

    Args:
      mode: 'predcls' | 'sgcls' | 'sgdet' | 'phrdet'.
      num_rel_classes: predicate vocabulary size including background.
      rel_names: optional names (index 0 = background) for reports.
      ks: recall cutoffs.
      iou_thres: box-match threshold (TEST default 0.5).
      zeroshot_triplets: (Z, 3) array of unseen (s_cls, o_cls, p) label
        triples (note the reference's column order, sgg_eval.py:283-289).
    """

    def __init__(
        self,
        mode: str,
        num_rel_classes: int,
        rel_names: Optional[Sequence[str]] = None,
        ks: Sequence[int] = (20, 50, 100),
        iou_thres: float = 0.5,
        zeroshot_triplets: Optional[np.ndarray] = None,
        nogc_top: int = 100,
    ):
        if mode not in ("predcls", "sgcls", "sgdet", "phrdet"):
            raise ValueError(f"invalid mode {mode}")
        self.mode = mode
        self.num_rel = num_rel_classes
        self.rel_names = list(rel_names) if rel_names else [str(i) for i in range(num_rel_classes)]
        self.ks = tuple(ks)
        self.iou_thres = iou_thres
        self.zeroshot_triplets = zeroshot_triplets
        self.nogc_top = nogc_top
        self.reset()

    def reset(self):
        ks = self.ks
        self.recall = {k: [] for k in ks}
        self.recall_nogc = {k: [] for k in ks}
        self.zeroshot_recall = {k: [] for k in ks}
        self.accuracy_hit = {k: [] for k in ks}
        self.accuracy_count = {k: [] for k in ks}
        # per-class recall collections; index 0 doubles as the "all" bucket
        self.mean_recall_collect = {k: [[] for _ in range(self.num_rel)] for k in ks}
        self.ng_mean_recall_collect = {k: [[] for _ in range(self.num_rel)] for k in ks}
        self.num_images = 0

    # ------------------------------------------------------------------
    def add_image(
        self,
        gt_boxes: np.ndarray,
        gt_classes: np.ndarray,
        gt_rels: np.ndarray,
        pred_boxes: np.ndarray,
        pred_classes: np.ndarray,
        obj_scores: np.ndarray,
        pred_rel_inds: np.ndarray,
        rel_scores: np.ndarray,
    ) -> None:
        """Evaluate one image.

        ``pred_rel_inds`` (P, 2) must already be sorted by triple score
        descending; ``rel_scores`` is the (P, C) per-predicate softmax with
        background at column 0.
        """
        gt_rels = np.asarray(gt_rels)
        if gt_rels.shape[0] == 0:
            return  # reference skips relation-less images (vg_eval.py:472)
        self.num_images += 1

        if self.mode == "predcls":
            pred_boxes = gt_boxes
            pred_classes = gt_classes
            obj_scores = np.ones(gt_classes.shape[0])

        # ---------------- pair accuracy bookkeeping (predcls/sgcls)
        if self.mode != "sgdet" and self.mode != "phrdet":
            pred_pair_key = pred_rel_inds[:, 0] * 1024 + pred_rel_inds[:, 1]
            gt_pair_key = gt_rels[:, 0] * 1024 + gt_rels[:, 1]
            pred_pair_in_gt = np.isin(pred_pair_key, gt_pair_key)
        else:
            pred_pair_in_gt = None

        # ---------------- zero-shot bookkeeping
        zs_idx: List[int] = []
        if self.zeroshot_triplets is not None:
            gt_zs = np.column_stack(
                (gt_classes[gt_rels[:, 0]], gt_classes[gt_rels[:, 1]], gt_rels[:, 2])
            )
            zs_idx = np.where(intersect_2d(gt_zs, self.zeroshot_triplets).any(-1))[0].tolist()

        if pred_rel_inds.shape[0] == 0:
            return

        # ---------------- graph-constraint recall
        pred_rels = np.column_stack((pred_rel_inds, 1 + rel_scores[:, 1:].argmax(1)))
        pred_scores = rel_scores[:, 1:].max(1)

        gt_triplets, gt_triplet_boxes, _ = make_triplets(gt_rels, gt_classes, gt_boxes)
        pred_triplets, pred_triplet_boxes, _ = make_triplets(
            pred_rels, pred_classes, pred_boxes, pred_scores, obj_scores
        )
        pred_to_gt = match_triplets(
            gt_triplets,
            pred_triplets,
            gt_triplet_boxes,
            pred_triplet_boxes,
            self.iou_thres,
            phrdet=self.mode == "phrdet",
        )

        # ---------------- no-graph-constraint recall: top-N over P×(C-1)
        overall = (
            obj_scores[pred_rel_inds].prod(1)[:, None] * rel_scores[:, 1:]
        )
        nogc_inds = argsort_desc(overall)[: self.nogc_top]
        nogc_pred_rels = np.column_stack(
            (pred_rel_inds[nogc_inds[:, 0]], nogc_inds[:, 1] + 1)
        )
        nogc_triplets, nogc_triplet_boxes, _ = make_triplets(
            nogc_pred_rels, pred_classes, pred_boxes
        )
        nogc_pred_to_gt = match_triplets(
            gt_triplets,
            nogc_triplets,
            gt_triplet_boxes,
            nogc_triplet_boxes,
            self.iou_thres,
            phrdet=self.mode == "phrdet",
        )

        num_gt = float(gt_rels.shape[0])
        gt_labels = gt_rels[:, 2].astype(np.int64)

        for k in self.ks:
            match = _union_upto(pred_to_gt, k)
            self.recall[k].append(len(match) / num_gt)
            self._collect_per_class(self.mean_recall_collect[k], gt_labels, match)

            ng_match = _union_upto(nogc_pred_to_gt, k)
            self.recall_nogc[k].append(len(ng_match) / num_gt)
            self._collect_per_class(self.ng_mean_recall_collect[k], gt_labels, ng_match)

            if zs_idx:
                match_list = match.tolist()
                hit = len(zs_idx) + len(match_list) - len(set(zs_idx + match_list))
                self.zeroshot_recall[k].append(hit / len(zs_idx))

            if pred_pair_in_gt is not None:
                gt_pair_p2g = [p for p, f in zip(pred_to_gt, pred_pair_in_gt) if f]
                gm = _union_upto(gt_pair_p2g, k) if gt_pair_p2g else []
                self.accuracy_hit[k].append(float(len(gm)))
                self.accuracy_count[k].append(num_gt)

    def _collect_per_class(self, collect, gt_labels: np.ndarray, match: np.ndarray):
        hit = np.zeros(self.num_rel, dtype=np.int64)
        count = np.zeros(self.num_rel, dtype=np.int64)
        np.add.at(count, gt_labels, 1)
        count[0] = len(gt_labels)
        if len(match):
            matched_labels = gt_labels[np.asarray(match, dtype=np.int64)]
            np.add.at(hit, matched_labels, 1)
            hit[0] = len(match)
        for c in range(self.num_rel):
            if count[c] > 0:
                collect[c].append(hit[c] / count[c])

    # ------------------------------------------------------------------
    def aggregate(self) -> Dict[str, Dict[int, float]]:
        """Final metric dict; mR is per-class mean over images then classes
        (zero for never-seen classes, reference sgg_eval.py:445-465)."""

        def mean_or_zero(vals):
            return float(np.mean(vals)) if len(vals) else 0.0

        def mean_recall(collect):
            per_class = [
                mean_or_zero(collect[c]) for c in range(1, self.num_rel)
            ]
            return float(np.mean(per_class)) if per_class else 0.0, per_class

        out: Dict[str, Dict[int, float]] = {
            "R": {k: mean_or_zero(v) for k, v in self.recall.items()},
            "ngR": {k: mean_or_zero(v) for k, v in self.recall_nogc.items()},
            "zR": {k: mean_or_zero(v) for k, v in self.zeroshot_recall.items()},
            "mR": {},
            "ngmR": {},
            "A": {},
            "mR_per_class": {},
        }
        for k in self.ks:
            mr, per_class = mean_recall(self.mean_recall_collect[k])
            out["mR"][k] = mr
            out["mR_per_class"][k] = per_class
            out["ngmR"][k] = mean_recall(self.ng_mean_recall_collect[k])[0]
            if self.accuracy_count[k]:
                out["A"][k] = float(
                    np.mean(self.accuracy_hit[k]) / np.mean(self.accuracy_count[k])
                )
        return out

    def summary_string(self) -> str:
        agg = self.aggregate()
        lines = [f"SGG eval ({self.mode}, {self.num_images} images):"]
        for name in ("R", "mR", "ngR", "ngmR", "zR", "A"):
            vals = agg.get(name) or {}
            if vals:
                body = "; ".join(f"{name}@{k}: {v:.4f}" for k, v in sorted(vals.items()))
                lines.append("  " + body)
        return "\n".join(lines)


def compute_zeroshot_triplets(train_dataset, eval_dataset) -> np.ndarray:
    """Derive the unseen-triplet set for zero-shot recall.

    The reference ships a fixed ``zeroshot_triplet.pytorch`` tensor
    (evaluation/vg/vg_eval.py use at :459-583); it is exactly the set of
    (subject-class, object-class, predicate) triples that occur in the eval
    split's ground truth but never in the training split.  This recomputes
    that set from any pair of datasets exposing gt_classes/relationships.
    """

    def triplet_set(ds):
        out = set()
        for i in range(len(ds.img_info)):
            cls = ds.gt_classes[i]
            for s, o, p in ds.relationships[i]:
                out.add((int(cls[int(s)]), int(cls[int(o)]), int(p)))
        return out

    seen = triplet_set(train_dataset)
    unseen = sorted(triplet_set(eval_dataset) - seen)
    return np.asarray(unseen, dtype=np.int64).reshape(-1, 3)
