"""Open Images VRD evaluation: relationship/phrase AP + weighted mAP.

Re-design of the reference OI protocol (evaluation/oi/ap_eval_rel.py:40-219,
oi_evaluation.py): for every predicate class, detections are scored by
triplet confidence and greedily matched to unvisited GT triplets with the
same subject/object labels —

  * **rel**: match needs min(IoU_subj, IoU_obj) > 0.5 (:177-186);
  * **phr**: match on the union ("phrase") box IoU > 0.5 (:187-190);

AP uses the exact VOC-style precision envelope (:101-119); the weighted
mAP (wmAP) weighs per-class AP by its GT-count share, and the headline
Open Images score is 0.2*R@50 + 0.4*wmAP_rel + 0.4*wmAP_phr
(oi_evaluation.py final score).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def _iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,4) x (M,4) IoU, inclusive-pixel (utils/miscellaneous.py
    bbox_overlaps:72)."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt + 1, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-12)


def _union(b1: np.ndarray, b2: np.ndarray) -> np.ndarray:
    return np.concatenate(
        [np.minimum(b1[:, :2], b2[:, :2]), np.maximum(b1[:, 2:], b2[:, 2:])], -1
    )


def _voc_ap(rec: np.ndarray, prec: np.ndarray) -> float:
    mrec = np.concatenate(([0.0], rec, [1.0]))
    mpre = np.concatenate(([0.0], prec, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = max(mpre[i - 1], mpre[i])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


class OIEvaluator:
    """Accumulate per-image top-k relation detections; final wmAP scores."""

    def __init__(self, num_rel_classes: int, iou_thresh: float = 0.5,
                 recall_k: int = 50):
        self.num_rel = num_rel_classes
        self.iou = iou_thresh
        self.recall_k = recall_k
        self.reset()

    def reset(self):
        self._images: List[Dict] = []

    def add_image(
        self,
        det_sbj_boxes: np.ndarray,   # (D, 4) sorted by triplet score desc
        det_obj_boxes: np.ndarray,
        det_sbj_labels: np.ndarray,  # (D,)
        det_obj_labels: np.ndarray,
        det_prd_labels: np.ndarray,
        det_scores: np.ndarray,
        gt_sbj_boxes: np.ndarray,    # (G, 4)
        gt_obj_boxes: np.ndarray,
        gt_sbj_labels: np.ndarray,
        gt_obj_labels: np.ndarray,
        gt_prd_labels: np.ndarray,
    ):
        self._images.append(
            dict(
                ds=np.asarray(det_sbj_boxes, np.float64),
                do=np.asarray(det_obj_boxes, np.float64),
                ls=np.asarray(det_sbj_labels, np.int64),
                lo=np.asarray(det_obj_labels, np.int64),
                lp=np.asarray(det_prd_labels, np.int64),
                sc=np.asarray(det_scores, np.float64),
                gs=np.asarray(gt_sbj_boxes, np.float64),
                go=np.asarray(gt_obj_boxes, np.float64),
                gls=np.asarray(gt_sbj_labels, np.int64),
                glo=np.asarray(gt_obj_labels, np.int64),
                glp=np.asarray(gt_prd_labels, np.int64),
            )
        )

    # ------------------------------------------------------------------
    def _ap_for_class(self, c: int, phrase: bool):
        """(recall_pts, precision_pts, ap, npos) for predicate c."""
        npos = 0
        visited = {}
        for im_id, im in enumerate(self._images):
            gi = np.where(im["glp"] == c)[0]
            npos += len(gi)
            visited[im_id] = np.zeros(len(gi), bool)

        # gather detections of class c across images, remembering source
        rows = []
        for im_id, im in enumerate(self._images):
            di = np.where(im["lp"] == c)[0]
            for d in di:
                rows.append((im["sc"][d], im_id, d))
        rows.sort(key=lambda r: -r[0])

        tp = np.zeros(len(rows))
        fp = np.zeros(len(rows))
        for rank, (_, im_id, d) in enumerate(rows):
            im = self._images[im_id]
            gi = np.where(im["glp"] == c)[0]
            if len(gi) == 0:
                fp[rank] = 1
                continue
            valid = (im["gls"][gi] == im["ls"][d]) & (im["glo"][gi] == im["lo"][d])
            if not valid.any():
                fp[rank] = 1
                continue
            if phrase:
                det_r = _union(im["ds"][d:d + 1], im["do"][d:d + 1])
                gt_r = _union(im["gs"][gi], im["go"][gi])
                ov = _iou(det_r, gt_r)[0]
            else:
                ov_s = _iou(im["ds"][d:d + 1], im["gs"][gi])[0]
                ov_o = _iou(im["do"][d:d + 1], im["go"][gi])[0]
                ov = np.minimum(ov_s, ov_o)
            ov = ov * valid
            jmax = int(np.argmax(ov))
            if ov[jmax] > self.iou and not visited[im_id][jmax]:
                tp[rank] = 1
                visited[im_id][jmax] = True
            else:
                fp[rank] = 1

        tp = np.cumsum(tp)
        fp = np.cumsum(fp)
        rec = tp / (npos + 1e-12)
        prec = tp / np.maximum(tp + fp, 1e-12)
        return _voc_ap(rec, prec), npos

    def _recall_at_k(self) -> float:
        """Per-image triplet recall@k (min subj/obj IoU matching)."""
        scores = []
        for im in self._images:
            g = len(im["glp"])
            if g == 0:
                continue
            k = min(self.recall_k, len(im["lp"]))
            hit = np.zeros(g, bool)
            for d in range(k):
                valid = (
                    (im["gls"] == im["ls"][d])
                    & (im["glo"] == im["lo"][d])
                    & (im["glp"] == im["lp"][d])
                )
                if not valid.any():
                    continue
                ov = np.minimum(
                    _iou(im["ds"][d:d + 1], im["gs"])[0],
                    _iou(im["do"][d:d + 1], im["go"])[0],
                ) * valid
                j = int(np.argmax(ov))
                if ov[j] > self.iou:
                    hit[j] = True
            scores.append(hit.mean())
        return float(np.mean(scores)) if scores else 0.0

    def aggregate(self) -> Dict[str, float]:
        aps_rel, aps_phr, weights = [], [], []
        for c in range(1, self.num_rel):
            ap_r, npos = self._ap_for_class(c, phrase=False)
            ap_p, _ = self._ap_for_class(c, phrase=True)
            if npos == 0:
                continue
            aps_rel.append(ap_r)
            aps_phr.append(ap_p)
            weights.append(npos)
        w = np.asarray(weights, np.float64)
        w = w / max(w.sum(), 1e-12)
        m_rel = float(np.mean(aps_rel)) if aps_rel else 0.0
        m_phr = float(np.mean(aps_phr)) if aps_phr else 0.0
        wm_rel = float(np.sum(np.asarray(aps_rel) * w)) if aps_rel else 0.0
        wm_phr = float(np.sum(np.asarray(aps_phr) * w)) if aps_phr else 0.0
        r_at_k = self._recall_at_k()
        return {
            f"R@{self.recall_k}": r_at_k,
            "mAP_rel": m_rel,
            "mAP_phr": m_phr,
            "wmAP_rel": wm_rel,
            "wmAP_phr": wm_phr,
            "score": 0.2 * r_at_k + 0.4 * wm_rel + 0.4 * wm_phr,
        }
