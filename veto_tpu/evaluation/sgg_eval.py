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
from typing import Dict, List, Optional, Sequence, Tuple

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
    if len(pred_to_gt) == 0 or k <= 0:
        return np.array([], dtype=np.int64)
    # reduce() with a single element returns it untouched (a plain list)
    return np.asarray(reduce(np.union1d, pred_to_gt[:k]), dtype=np.int64)


# Head/body/tail split of the VG-50 predicate vocabulary in ORIGINAL
# (alphabetical) predicate order; index 0 is background
# (reference defaults.py:545-548 LONGTAIL_PART_DICT).
VG_LONGTAIL_PART_DICT: Tuple[Optional[str], ...] = (
    None, "b", "t", "t", "t", "t", "t", "t", "b", "t", "t", "t", "t", "t",
    "t", "t", "t", "t", "t", "t", "h", "b", "b", "b", "t", "t", "t", "t",
    "t", "b", "h", "h", "t", "t", "t", "t", "t", "t", "b", "t", "b", "b",
    "t", "b", "t", "t", "t", "t", "h", "b", "b",
)


def vg_longtail_parts(reordered: bool = True) -> List[Optional[str]]:
    """The VG part dict permuted for the active predicate id space.

    With REORDER_FREQ_BASED (the VETO default) predicate ids are frequency
    ranks; the static dict above is in original order, so remap via
    predicate_new_order (the reference applies the dict un-permuted — a
    sloppiness we do not reproduce)."""
    if not reordered:
        return list(VG_LONGTAIL_PART_DICT)
    from veto_tpu.data.predicate_stats import VG_PREDICATE_NEW_ORDER

    out: List[Optional[str]] = [None] * len(VG_LONGTAIL_PART_DICT)
    for old_id, part in enumerate(VG_LONGTAIL_PART_DICT):
        out[VG_PREDICATE_NEW_ORDER[old_id]] = part
    return out


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
        longtail_parts: Optional[Sequence[Optional[str]]] = None,
        stagewise: bool = False,
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
        # 'h'/'b'/'t' per predicate id (index 0 = background, ignored) —
        # reference LONGTAIL_PART_DICT (defaults.py:545-548)
        self.longtail_parts = (
            list(longtail_parts) if longtail_parts is not None else None
        )
        self.stagewise = (
            StagewiseEvaluator(mode, num_rel_classes, ks, iou_thres)
            if stagewise else None
        )
        self.reset()

    def reset(self):
        ks = self.ks
        self.recall = {k: [] for k in ks}
        self.recall_nogc = {k: [] for k in ks}
        self.zeroshot_recall = {k: [] for k in ks}
        self.accuracy_hit = {k: [] for k in ks}
        self.accuracy_count = {k: [] for k in ks}
        # accumulate recall aR@K = dataset-level sum(hits)/sum(gt)
        # (reference SGAccumulateRecall, sgg_eval.py:557-581 — note its
        # _recall_hit containers are never registered there [:388-389
        # commented out]; this is the working rebuild of the intent)
        self.acc_recall_hit = {k: [] for k in ks}
        self.acc_recall_count = {k: [] for k in ks}
        # per-class recall collections; index 0 doubles as the "all" bucket
        self.mean_recall_collect = {k: [[] for _ in range(self.num_rel)] for k in ks}
        self.ng_mean_recall_collect = {k: [[] for _ in range(self.num_rel)] for k in ks}
        self.num_images = 0
        if self.stagewise is not None:
            self.stagewise.reset()

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
        relness: Optional[np.ndarray] = None,
    ) -> None:
        """Evaluate one image.

        ``pred_rel_inds`` (P, 2) must already be sorted by triple score
        descending; ``rel_scores`` is the (P, C) per-predicate softmax with
        background at column 0.  ``relness`` (P,) or (P, I) optionally
        carries rel-PN pair-confidence scores aligned with the pairs, one
        column per rel-PN iteration, enabling the stagewise evaluator's
        ranking AP/AUC diagnostics (reference sgg_eval.py:963-1082).
        """
        gt_rels = np.asarray(gt_rels)
        if gt_rels.shape[0] == 0:
            return  # reference skips relation-less images (vg_eval.py:472)
        self.num_images += 1

        if self.mode == "predcls":
            pred_boxes = gt_boxes
            pred_classes = gt_classes
            obj_scores = np.ones(gt_classes.shape[0])

        if self.stagewise is not None and pred_rel_inds.shape[0] > 0:
            self.stagewise.add_image(
                gt_boxes, gt_classes, gt_rels, pred_boxes, pred_classes,
                pred_rel_inds, rel_scores, relness=relness,
            )

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
            self.acc_recall_hit[k].append(float(len(match)))
            self.acc_recall_count[k].append(num_gt)
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
            "aR": {
                k: float(np.sum(self.acc_recall_hit[k]))
                / (float(np.sum(self.acc_recall_count[k])) + 1e-10)
                for k in self.ks
            },
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
        if self.longtail_parts is not None:
            # head/body/tail split of the per-class mR list
            # (reference vg_eval.py longtail_part_eval:190-206: cate_rec_list
            # index idx maps to predicate id idx + 1)
            out["longtail"] = {}
            for k in self.ks:
                buckets: Dict[str, List[float]] = {"h": [], "b": [], "t": []}
                for idx, rec in enumerate(out["mR_per_class"][k]):
                    part = self.longtail_parts[idx + 1]
                    if part in buckets:
                        buckets[part].append(rec)
                out["longtail"][k] = {
                    part: (float(np.mean(v)) if v else 0.0)
                    for part, v in buckets.items()
                }
        return out

    def summary_string(self) -> str:
        agg = self.aggregate()
        lines = [f"SGG eval ({self.mode}, {self.num_images} images):"]
        for name in ("R", "mR", "ngR", "ngmR", "zR", "aR", "A"):
            vals = agg.get(name) or {}
            if vals:
                body = "; ".join(f"{name}@{k}: {v:.4f}" for k, v in sorted(vals.items()))
                lines.append("  " + body)
        if "longtail" in agg:
            lines.append("longtail part recall:")
            for k, parts in sorted(agg["longtail"].items()):
                lines.append(
                    f"  Top{k:4}: head: {parts['h']:.4f} body: {parts['b']:.4f} "
                    f"tail: {parts['t']:.4f}"
                )
        if self.stagewise is not None:
            lines.append(self.stagewise.summary_string())
        return "\n".join(lines)


def load_zeroshot_triplets_file(path: str) -> np.ndarray:
    """Load the reference's serialized zero-shot triplet tensor
    (``zeroshot_triplet.pytorch``, rows = (s_cls, o_cls, predicate) in the
    ORIGINAL VG predicate order — usable only when REORDER_FREQ_BASED is
    off; with reorder on, derive via :func:`compute_zeroshot_triplets`)."""
    import torch

    t = torch.load(path, map_location="cpu", weights_only=False)
    arr = np.asarray(t, dtype=np.int64).reshape(-1, 3)
    return arr


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


def _roc_auc(y: np.ndarray, scores: np.ndarray) -> float:
    """ROC-AUC of binary labels ``y`` under ranking ``scores`` — NumPy
    equivalent of the reference's ``sklearn.metrics.roc_curve`` + ``auc``
    (sgg_eval.py:965-978).  Returns NaN when only one class is present
    (sklearn's behavior, which the reference uses to skip the entry)."""
    y = np.asarray(y, np.float64)
    pos = y.sum()
    neg = len(y) - pos
    if pos == 0 or neg == 0:
        return float("nan")
    order = np.argsort(-scores, kind="stable")
    y = y[order]
    s = np.asarray(scores, np.float64)[order]
    tps = np.cumsum(y)
    fps = np.cumsum(1.0 - y)
    # one curve point per distinct threshold (last index of each run)
    last = np.r_[np.nonzero(np.diff(s))[0], len(s) - 1]
    tpr = np.r_[0.0, tps[last] / pos]
    fpr = np.r_[0.0, fps[last] / neg]
    return float(np.trapezoid(tpr, fpr))


def _rel_pn_ap(scores: np.ndarray, posb_tp: np.ndarray, total_gt: float,
               pred_range: int) -> float:
    """The reference's ``eval_ap`` (sgg_eval.py:980-1037): precision/recall
    at relness thresholds 0.1..0.9 over the top-``pred_range`` ranked
    pairs, VOC-style interpolated area.  ``posb_tp[p]`` is the GT-relation
    index pair ``p`` localizes (−1 = none); tp counts unique GT hit,
    fp counts unique values among the non-matching set (the reference's
    ``len(unique(posb_tp[fp_idx]))`` — 0 or 1, all entries are −1)."""
    order = np.argsort(-scores, kind="stable")[:pred_range]
    top_scores = scores[order]
    prs, recs = [], []
    for t in range(1, 10):
        sel = order[top_scores > t * 0.1]
        matched = posb_tp[sel]
        tp = len(np.unique(matched[matched >= 0]))
        fp = 1 if (matched < 0).any() else 0
        prs.append(tp / (tp + fp + 1e-4))
        recs.append(tp / (total_gt + 1e-4))
    mrec = np.concatenate(([0.0], recs, [1.0]))
    mpre = np.concatenate(([0.0], prs, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
    i = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[i + 1] - mrec[i]) * mpre[i + 1]))


# ----------------------------------------------------------------------
# stage-wise diagnostic recall (reference sgg_eval.py SGStagewiseRecall
# :582-1207)
# ----------------------------------------------------------------------
class StagewiseEvaluator:
    """Where in the pipeline do ground-truth relations get lost?

    Per top-K relation prediction set, four progressively stricter hit
    criteria against each GT relation (sgg_eval.py:1085-1205):

      pair_loc  — subject and object boxes both located (IoU ≥ thres);
      pair_det  — located AND class-matched;
      pred_cls  — pair located AND predicate classified correctly;
      rel_hit   — pair detected AND predicate correct (the full triplet).

    Plus instance-level locate/detect recall (:853-858) and the effective-
    union-pair statistics over the full candidate pair list (:949-962).
    The reference expands every prediction pair into all combinations of
    matched GT boxes (dump_hit_indx_dict_to_tensor) before intersecting
    with the GT pair list; that expansion is equivalent to the dense
    (pred_pair × gt_rel) match matrices computed here.

    The rel-PN AP/AUC diagnostics (:963-1082) run when per-pair relness
    scores are supplied to :meth:`add_image` (``relness`` (P, I), one
    column per rel-PN iteration): each column is ranked, matched against
    the pair-localization hits, and scored as ROC-AUC plus the
    reference's 9-point thresholded AP — NumPy reimplementations of its
    sklearn ``eval_roc`` / ``eval_ap`` helpers.
    """

    def __init__(self, mode: str, num_rel_classes: int,
                 ks: Sequence[int] = (20, 50, 100), iou_thres: float = 0.5,
                 valid_rel_prop_num: int = 300):
        self.mode = mode
        self.num_rel = num_rel_classes
        self.ks = tuple(ks)
        self.iou_thres = iou_thres
        # top-N relness ranking window (reference vaild_rel_prop_num =
        # REL_PROP.VALID_PAIRS_NUM, sgg_eval.py:668)
        self.valid_rel_prop_num = valid_rel_prop_num
        self.hit_types = ("pair_loc", "pair_det", "pred_cls", "rel_hit")
        self.reset()

    def reset(self):
        self.recall = {t: {k: [] for k in self.ks} for t in self.hit_types}
        self.inst_loc_recall: List[float] = []
        self.inst_det_recall: List[float] = []
        self.eff_pair_rate: List[float] = []
        self.eff_pair_range: List[float] = []
        # rel-PN ranking diagnostics (sgg_eval.py:963-1082): keyed
        # "ap-iter{i}-top{n}" / "auc-iter{i}-top{n}"
        self.rel_pn: Dict[str, List[float]] = {}
        # per-class (K, C, 2) tables: [:, :, 0] images-with-class-hit,
        # [:, :, 1] images-with-class-present (the reference's indexed +=
        # collapses duplicate class ids — :1177-1186)
        self.per_cls_hit = {
            t: np.zeros((len(self.ks), self.num_rel, 2), np.int64)
            for t in self.hit_types
        }

    def add_image(
        self,
        gt_boxes: np.ndarray,
        gt_classes: np.ndarray,
        gt_rels: np.ndarray,
        pred_boxes: np.ndarray,
        pred_classes: np.ndarray,
        pred_rel_inds: np.ndarray,
        rel_scores: np.ndarray,
        relness: Optional[np.ndarray] = None,
    ) -> None:
        gt_rels = np.asarray(gt_rels)
        num_gt = float(gt_rels.shape[0])
        if num_gt == 0:
            return
        if self.mode == "predcls":
            pred_boxes = gt_boxes
            pred_classes = gt_classes

        iou = np_iou(np.asarray(pred_boxes, np.float64),
                     np.asarray(gt_boxes, np.float64))
        loc = iou >= self.iou_thres                           # (Pb, Gb)
        det = loc & (np.asarray(pred_classes)[:, None]
                     == np.asarray(gt_classes)[None, :])

        self.inst_loc_recall.append(loc.any(0).sum() / (len(gt_boxes) + 1e-6))
        self.inst_det_recall.append(det.any(0).sum() / (len(gt_boxes) + 1e-6))

        ps = np.asarray(pred_rel_inds)[:, 0]
        po = np.asarray(pred_rel_inds)[:, 1]
        grs, gro, grp = gt_rels[:, 0], gt_rels[:, 1], gt_rels[:, 2]
        pred_label = 1 + rel_scores[:, 1:].argmax(1)

        loc_pairs = loc[ps][:, grs] & loc[po][:, gro]         # (P, R)
        det_pairs = det[ps][:, grs] & det[po][:, gro]
        pred_eq = pred_label[:, None] == grp[None, :]
        hits = {
            "pair_loc": loc_pairs,
            "pair_det": det_pairs,
            "pred_cls": loc_pairs & pred_eq,
            "rel_hit": det_pairs & pred_eq,
        }

        # effective union pairs over the whole candidate list (:949-962)
        self.eff_pair_rate.append(loc_pairs.sum() / (len(ps) + 1e-5))
        hit_rows = np.repeat(np.arange(len(ps)), loc_pairs.sum(1))
        self.eff_pair_range.append(
            float(np.percentile(hit_rows, 95)) if len(hit_rows) else float(len(ps))
        )

        # rel-PN relness ranking AP/AUC (:963-1082).  posb_tp[p] = the GT
        # relation pair p localizes (−1 = none).  The reference scatters
        # with duplicate indices — the surviving write is the last expanded
        # combo row (product over matched boxes, ascending) and the last
        # intersect hit within it, i.e. the hit with the lexicographically
        # largest (gt_subj_box, gt_obj_box, gt_rel_index) key.
        if relness is not None:
            relness = np.asarray(relness, np.float64)
            if relness.ndim == 1:
                relness = relness[:, None]
            n_gt = loc_pairs.shape[1]
            r_idx = np.arange(n_gt)
            key = (grs.astype(np.int64) * (len(gt_boxes) + 1)
                   + gro.astype(np.int64)) * (n_gt + 1) + r_idx
            posb_tp = np.where(
                loc_pairs.any(1),
                r_idx[np.argmax(np.where(loc_pairs, key[None, :], -1), axis=1)],
                -1,
            )
            y = (posb_tp >= 0).astype(np.float64)
            for it in range(relness.shape[1]):
                sc = relness[:, it]
                for n in (self.valid_rel_prop_num, 100):
                    order = np.argsort(-sc, kind="stable")[:n]
                    auc = _roc_auc(y[order], sc[order])
                    ap = _rel_pn_ap(sc, posb_tp, num_gt, n)
                    self.rel_pn.setdefault(
                        f"ap-iter{it}-top{n}", []).append(ap)
                    if not np.isnan(auc):
                        self.rel_pn.setdefault(
                            f"auc-iter{it}-top{n}", []).append(auc)

        present = np.unique(grp)
        for ki, k in enumerate(self.ks):
            for t in self.hit_types:
                gt_hit = hits[t][:k].any(0)
                self.recall[t][k].append(gt_hit.sum() / (num_gt + 1e-5))
                self.per_cls_hit[t][ki, np.unique(grp[gt_hit]), 0] += 1
                self.per_cls_hit[t][ki, present, 1] += 1

    def aggregate(self) -> Dict[str, Dict]:
        out: Dict[str, Dict] = {
            t: {k: (float(np.mean(v)) if v else 0.0) for k, v in kv.items()}
            for t, kv in self.recall.items()
        }
        out["instances"] = {
            "loc": float(np.mean(self.inst_loc_recall)) if self.inst_loc_recall else 0.0,
            "det": float(np.mean(self.inst_det_recall)) if self.inst_det_recall else 0.0,
        }
        out["effective_pairs"] = {
            "rate": float(np.mean(self.eff_pair_rate)) if self.eff_pair_rate else 0.0,
            "range_p85": float(np.percentile(self.eff_pair_range, 85))
            if self.eff_pair_range else 0.0,
        }
        if self.rel_pn:
            out["rel_pn"] = {k: float(np.mean(v))
                             for k, v in sorted(self.rel_pn.items())}
        return out

    def summary_string(self) -> str:
        agg = self.aggregate()
        lines = ["SGG Stagewise Recall:"]
        for t in self.hit_types:
            body = "; ".join(
                f"R @ {k}: {agg[t][k]:.4f}" for k in self.ks
            )
            lines.append(f"  {body}  type={t}")
        lines.append(
            f"  instances locating: {agg['instances']['loc']:.4f} "
            f"detection: {agg['instances']['det']:.4f}"
        )
        lines.append(
            f"  effective union pairs rate: {agg['effective_pairs']['rate']:.3f} "
            f"range(p85): {agg['effective_pairs']['range_p85']:.0f}"
        )
        if "rel_pn" in agg:
            body = "; ".join(f"{k}: {v:.4f}" for k, v in agg["rel_pn"].items())
            lines.append(f"  rel-PN ranking: {body}")
        return "\n".join(lines)
