"""StagewiseEvaluator vs the REFERENCE SGStagewiseRecall (sgg_eval.py:582-1207).

The reference class is executed directly (with its package imports stubbed
and the real vg_stage_eval_utils) on fake images; our dense-matrix
re-formulation must reproduce every recall list exactly.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import torch

from ref_loader import _AttrDict, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not mounted"
)

VG = "/root/reference/pysgg/data/datasets/evaluation/vg"
NUM_REL = 8
KS = (20, 50, 100)


def _intersect_2d(x1, x2):
    return (x1[..., None] == x2.T[None, ...]).all(1)


def load_reference_stagewise(rel_pn_on=False):
    cfg = _AttrDict()
    rh = cfg.MODEL.ROI_RELATION_HEAD
    rh.VG_NUM_CLASSES = NUM_REL
    rh.NUM_CLASSES = NUM_REL
    rh.MAX_PROPOSAL_PAIR = 2048
    rh.RELATION_PROPOSAL_MODEL.PAIR_NUMS_AFTER_FILTERING = -1
    rh.RELATION_PROPOSAL_MODEL.SET_ON = rel_pn_on
    rh.BGNN_MODULE.MP_ON_VALID_PAIRS = False
    rh.PREDICTOR = "VETOPredictor"
    rh.LONGTAIL_PART_DICT = [None] + ["t"] * (NUM_REL - 1)

    cfgmod = types.ModuleType("pysgg.config")
    cfgmod.cfg = cfg
    misc = types.ModuleType("pysgg.utils.miscellaneous")
    misc.intersect_2d = _intersect_2d
    misc.argsort_desc = lambda s: np.column_stack(
        np.unravel_index(np.argsort(-s.ravel()), s.shape))
    misc.bbox_overlaps = None
    sys.modules.update({
        "pysgg": types.ModuleType("pysgg"),
        "pysgg.config": cfgmod,
        "pysgg.utils": types.ModuleType("pysgg.utils"),
        "pysgg.utils.miscellaneous": misc,
        "pysgg.data": types.ModuleType("x"),
        "pysgg.data.datasets": types.ModuleType("x"),
        "pysgg.data.datasets.evaluation": types.ModuleType("x"),
        "pysgg.data.datasets.evaluation.vg": types.ModuleType("x"),
    })
    # the REAL stage-eval utils (boxlist_iou, pair expansion)
    spec = importlib.util.spec_from_file_location(
        "pysgg.data.datasets.evaluation.vg.vg_stage_eval_utils",
        os.path.join(VG, "vg_stage_eval_utils.py"))
    utils = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = utils
    spec.loader.exec_module(utils)

    spec = importlib.util.spec_from_file_location(
        "ref_sgg_eval_stage", os.path.join(VG, "sgg_eval.py"))
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    return ref


class StageBoxList:
    """BoxList stand-in for boxlist_iou (bbox/size/area/fields)."""

    def __init__(self, bbox, size, **fields):
        self.bbox = torch.as_tensor(bbox, dtype=torch.float32)
        self.size = size
        self._fields = fields

    def area(self):
        b = self.bbox
        return (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)

    def get_field(self, k):
        return self._fields[k]

    def __len__(self):
        return self.bbox.shape[0]


def fake_image(rng, n_obj, n_gt_rel, n_pred_rel):
    gt_boxes = np.sort(rng.uniform(0, 80, (n_obj, 4)), axis=-1).astype(np.float32)
    gt_boxes[:, 2:] += 20
    gt_classes = rng.randint(1, 10, n_obj)
    pairs = [(i, j) for i in range(n_obj) for j in range(n_obj) if i != j]
    sel = rng.choice(len(pairs), n_gt_rel, replace=False)
    gt_rels = np.array(
        [[pairs[s][0], pairs[s][1], rng.randint(1, NUM_REL)] for s in sel])
    pred_boxes = gt_boxes + rng.uniform(-12, 12, gt_boxes.shape).astype(np.float32)
    pred_classes = gt_classes.copy()
    flip = rng.rand(n_obj) < 0.4
    pred_classes[flip] = rng.randint(1, 10, int(flip.sum()))
    obj_scores = rng.uniform(0.3, 1.0, n_obj)
    psel = rng.choice(len(pairs), n_pred_rel, replace=False)
    pred_rel_inds = np.array([pairs[s] for s in psel])
    rel_scores = rng.dirichlet(np.ones(NUM_REL), n_pred_rel)
    pred_rel_inds[0] = gt_rels[0, :2]
    rel_scores[0] = 0.02
    rel_scores[0, gt_rels[0, 2]] = 0.9
    return dict(gt_boxes=gt_boxes, gt_classes=gt_classes, gt_rels=gt_rels,
                pred_boxes=pred_boxes, pred_classes=pred_classes,
                obj_scores=obj_scores, pred_rel_inds=pred_rel_inds,
                rel_scores=rel_scores)


def test_stagewise_matches_reference():
    from veto_tpu.evaluation.sgg_eval import StagewiseEvaluator

    ref = load_reference_stagewise()
    mode = "sgcls"
    rd = {}
    ev_ref = ref.SGStagewiseRecall(rd)
    ev_ref.register_container(mode)

    ours = StagewiseEvaluator(mode, NUM_REL)

    rng = np.random.RandomState(17)
    for n_obj, n_gt, n_pred in ((6, 5, 24), (8, 7, 30), (5, 3, 14)):
        im = fake_image(rng, n_obj, n_gt, n_pred)
        gt_bl = StageBoxList(im["gt_boxes"], (100, 100),
                             labels=torch.from_numpy(im["gt_classes"]))
        pred_bl = StageBoxList(
            im["pred_boxes"], (100, 100),
            pred_labels=torch.from_numpy(im["pred_classes"]),
            pred_scores=torch.from_numpy(im["obj_scores"]),
            pred_rel_scores=torch.from_numpy(im["rel_scores"]),
            rel_pair_idxs=torch.from_numpy(im["pred_rel_inds"]),
        )
        ev_ref.calculate_recall(
            mode, {"iou_thres": 0.5}, gt_bl,
            torch.from_numpy(im["gt_rels"]), pred_bl,
            im["pred_rel_inds"], im["rel_scores"],
        )
        ours.add_image(
            im["gt_boxes"], im["gt_classes"], im["gt_rels"],
            im["pred_boxes"], im["pred_classes"],
            im["pred_rel_inds"], im["rel_scores"],
        )

    for t in ("pair_loc", "pair_det", "pred_cls", "rel_hit"):
        for k in KS:
            np.testing.assert_allclose(
                ours.recall[t][k],
                rd[f"{mode}_stage_recall_{t}"][k],
                rtol=1e-9, err_msg=f"{t}@{k}",
            )
    np.testing.assert_allclose(
        ours.inst_loc_recall, rd[f"{mode}_instances_loc_recall"], rtol=1e-9)
    np.testing.assert_allclose(
        ours.inst_det_recall, rd[f"{mode}_instances_det_recall"], rtol=1e-9)
    np.testing.assert_allclose(
        ours.eff_pair_rate,
        rd[f"{mode}_stage_recall_effective_union_pairs_rate"], rtol=1e-9)
    np.testing.assert_allclose(
        ours.eff_pair_range,
        rd[f"{mode}_stage_recall_effective_union_pairs_range"], rtol=1e-9)
    # per-class hit/present tables (3, C, 2)
    for t in ("pair_loc", "pair_det", "pred_cls", "rel_hit"):
        np.testing.assert_array_equal(
            ours.per_cls_hit[t],
            ev_ref.relation_per_cls_hit_recall[t].numpy(), err_msg=t)


def test_rel_pn_ap_auc_matches_reference():
    """The rel-PN relness ranking diagnostics (reference sgg_eval.py
    :963-1082, sklearn ROC + 9-point thresholded AP) vs our NumPy port."""
    from veto_tpu.evaluation.sgg_eval import StagewiseEvaluator

    ref = load_reference_stagewise(rel_pn_on=True)
    mode = "sgcls"
    rd = {}
    ev_ref = ref.SGStagewiseRecall(rd)
    ev_ref.register_container(mode)
    assert ev_ref.rel_pn_on

    ours = StagewiseEvaluator(mode, NUM_REL, valid_rel_prop_num=300)

    rng = np.random.RandomState(23)
    for n_obj, n_gt, n_pred in ((6, 5, 24), (8, 7, 30), (5, 3, 14),
                                (7, 9, 40)):
        im = fake_image(rng, n_obj, n_gt, n_pred)
        relness = rng.uniform(0.0, 1.0, (n_pred, 1))
        gt_bl = StageBoxList(im["gt_boxes"], (100, 100),
                             labels=torch.from_numpy(im["gt_classes"]))
        pred_bl = StageBoxList(
            im["pred_boxes"], (100, 100),
            pred_labels=torch.from_numpy(im["pred_classes"]),
            pred_scores=torch.from_numpy(im["obj_scores"]),
            pred_rel_scores=torch.from_numpy(im["rel_scores"]),
            rel_pair_idxs=torch.from_numpy(im["pred_rel_inds"]),
            relness=torch.from_numpy(relness),
        )
        ev_ref.calculate_recall(
            mode, {"iou_thres": 0.5}, gt_bl,
            torch.from_numpy(im["gt_rels"]), pred_bl,
            im["pred_rel_inds"], im["rel_scores"],
        )
        ours.add_image(
            im["gt_boxes"], im["gt_classes"], im["gt_rels"],
            im["pred_boxes"], im["pred_classes"],
            im["pred_rel_inds"], im["rel_scores"], relness=relness,
        )

    for key in ("ap-iter0-top300", "ap-iter0-top100",
                "auc-iter0-top300", "auc-iter0-top100"):
        ref_vals = rd[f"{mode}_stage_recall_rel_pn_{key}"]
        np.testing.assert_allclose(
            ours.rel_pn[key], ref_vals, rtol=1e-9, atol=1e-12,
            err_msg=key)
    agg = ours.aggregate()
    assert "rel_pn" in agg and "ap-iter0-top300" in agg["rel_pn"]
    assert "rel-PN ranking" in ours.summary_string()


def test_longtail_part_split():
    """Head/body/tail bucketing of per-class mR (vg_eval.py:190-206)."""
    from veto_tpu.evaluation.sgg_eval import SGGEvaluator

    parts = [None, "h", "b", "t", "t", "b", "h", "t"]
    ev = SGGEvaluator(mode="predcls", num_rel_classes=NUM_REL,
                      longtail_parts=parts)
    rng = np.random.RandomState(3)
    for n_obj, n_gt, n_pred in ((6, 5, 20), (7, 6, 25)):
        im = fake_image(rng, n_obj, n_gt, n_pred)
        ev.add_image(
            gt_boxes=im["gt_boxes"], gt_classes=im["gt_classes"],
            gt_rels=im["gt_rels"], pred_boxes=im["gt_boxes"],
            pred_classes=im["gt_classes"], obj_scores=np.ones(n_obj),
            pred_rel_inds=im["pred_rel_inds"], rel_scores=im["rel_scores"],
        )
    agg = ev.aggregate()
    assert set(agg["longtail"][100]) == {"h", "b", "t"}
    for k in KS:
        per_class = agg["mR_per_class"][k]
        for part in ("h", "b", "t"):
            vals = [per_class[i - 1] for i in range(1, NUM_REL)
                    if parts[i] == part]
            want = float(np.mean(vals)) if vals else 0.0
            assert abs(agg["longtail"][k][part] - want) < 1e-12
    assert "longtail part recall" in ev.summary_string()


def test_vg_longtail_dict_shape():
    from veto_tpu.evaluation.sgg_eval import VG_LONGTAIL_PART_DICT

    assert len(VG_LONGTAIL_PART_DICT) == 51
    assert VG_LONGTAIL_PART_DICT[0] is None
    assert set(VG_LONGTAIL_PART_DICT[1:]) == {"h", "b", "t"}
