"""Pascal VOC dataset reader + mAP evaluator (golden vs the reference)."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import torch

from ref_loader import reference_available

REF_VOC_EVAL = (
    "/root/reference/pysgg/data/datasets/evaluation/voc/voc_eval.py"
)


@pytest.fixture
def voc_dir(tmp_path):
    from PIL import Image

    (tmp_path / "Annotations").mkdir()
    (tmp_path / "JPEGImages").mkdir()
    (tmp_path / "ImageSets" / "Main").mkdir(parents=True)

    def xml(objs, w=60, h=40):
        body = "".join(
            f"<object><name>{n}</name><difficult>{d}</difficult>"
            f"<bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin>"
            f"<xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox></object>"
            for n, d, x1, y1, x2, y2 in objs
        )
        return (f"<annotation><size><width>{w}</width>"
                f"<height>{h}</height></size>{body}</annotation>")

    samples = {
        "img1": [("dog", 0, 5, 5, 25, 25), ("cat", 0, 30, 10, 55, 35),
                 ("dog", 1, 1, 1, 10, 10)],   # one difficult dog
        "img2": [("person", 0, 10, 10, 40, 30)],
    }
    for name, objs in samples.items():
        (tmp_path / "Annotations" / f"{name}.xml").write_text(xml(objs))
        Image.new("RGB", (60, 40), (10, 20, 30)).save(
            tmp_path / "JPEGImages" / f"{name}.jpg")
    (tmp_path / "ImageSets" / "Main" / "train.txt").write_text(
        "img1\nimg2\n")
    return tmp_path


def test_voc_dataset_protocol(voc_dir):
    from veto_tpu.data.voc import VOCDataset

    ds = VOCDataset(str(voc_dir), "train")
    assert len(ds) == 2
    rec = ds.get_groundtruth(0)
    # difficult dog dropped by default; coordinates 0-based (voc.py:99-110)
    assert len(rec["boxes"]) == 2
    np.testing.assert_allclose(rec["boxes"][0], [4, 4, 24, 24])
    assert rec["labels"][0] == ds.ind_to_classes.index("dog")
    assert ds.load_image(0).shape == (40, 60, 3)

    ds_diff = VOCDataset(str(voc_dir), "train", use_difficult=True)
    rec = ds_diff.get_groundtruth(0)
    assert len(rec["boxes"]) == 3
    assert rec["difficult"].sum() == 1


def _load_ref_voc_eval():
    """Exec the reference voc_eval with BoxList/boxlist_iou shims that
    reproduce the real ones' math (TO_REMOVE=1)."""

    class _BL:
        def __init__(self, bbox, size, mode="xyxy"):
            self.bbox = torch.as_tensor(np.asarray(bbox, np.float64))
            self.size = size

        def area(self):
            b = self.bbox
            return (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)

    def _iou(bl1, bl2):
        b1, b2 = bl1.bbox, bl2.bbox
        area1, area2 = bl1.area(), bl2.area()
        lt = torch.max(b1[:, None, :2], b2[:, :2])
        rb = torch.min(b1[:, None, 2:], b2[:, 2:])
        wh = (rb - lt + 1).clamp(min=0)
        inter = wh[:, :, 0] * wh[:, :, 1]
        return inter / (area1[:, None] + area2 - inter)

    sys.modules.setdefault("pysgg", types.ModuleType("pysgg"))
    sys.modules["pysgg.structures"] = types.ModuleType("pysgg.structures")
    m1 = types.ModuleType("pysgg.structures.bounding_box")
    m1.BoxList = _BL
    m2 = types.ModuleType("pysgg.structures.boxlist_ops")
    m2.boxlist_iou = _iou
    sys.modules["pysgg.structures.bounding_box"] = m1
    sys.modules["pysgg.structures.boxlist_ops"] = m2
    spec = importlib.util.spec_from_file_location("ref_voc_eval", REF_VOC_EVAL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod, _BL


@pytest.mark.skipif(not reference_available(), reason="reference absent")
@pytest.mark.parametrize("use_07", [True, False])
def test_voc_map_matches_reference(use_07):
    from veto_tpu.evaluation.voc_eval import VOCEvaluator

    ref, BL = _load_ref_voc_eval()
    rng = np.random.RandomState(4)
    ours = VOCEvaluator(use_07_metric=use_07)
    gt_bls, pred_bls = [], []
    for _ in range(5):
        g = rng.randint(2, 5)
        d = rng.randint(3, 9)
        gt_boxes = np.sort(rng.uniform(0, 80, (g, 4)), -1)
        gt_boxes[:, 2:] += 15
        gt_labels = rng.randint(1, 4, g)
        gt_diff = rng.rand(g) < 0.25
        pred_boxes = np.vstack([
            gt_boxes + rng.uniform(-8, 8, gt_boxes.shape),
            np.sort(rng.uniform(0, 80, (d - g, 4)), -1),
        ])[:d]
        pred_labels = rng.randint(1, 4, d)
        pred_scores = rng.rand(d)

        ours.add_image(pred_boxes, pred_labels, pred_scores,
                       gt_boxes, gt_labels, gt_diff)
        gbl = BL(gt_boxes, (100, 100))
        gbl.get_field = {"labels": torch.from_numpy(gt_labels),
                         "difficult": torch.from_numpy(gt_diff)}.get
        pbl = BL(pred_boxes, (100, 100))
        pbl.get_field = {"labels": torch.from_numpy(pred_labels),
                         "scores": torch.from_numpy(pred_scores)}.get
        gt_bls.append(gbl)
        pred_bls.append(pbl)

    want = ref.eval_detection_voc(pred_bls, gt_bls, iou_thresh=0.5,
                                  use_07_metric=use_07)
    got = ours.aggregate()
    np.testing.assert_allclose(got["ap"], want["ap"], rtol=1e-9)
    np.testing.assert_allclose(got["map"], want["map"], rtol=1e-9)
