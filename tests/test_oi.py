"""Open Images dataset reader + wmAP evaluation protocol tests."""

import json
import os

import numpy as np
import pytest

from veto_tpu.data.open_image import OIDataset
from veto_tpu.evaluation.oi_eval import OIEvaluator, _voc_ap


@pytest.fixture(scope="module")
def oi_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("oi")
    rng = np.random.RandomState(0)
    annos = []
    for i in range(6):
        k = rng.randint(2, 5)
        b = np.sort(rng.uniform(0, 300, (k, 2, 2)), axis=1).reshape(k, 4)
        b[:, 2:] += 10
        annos.append(
            {
                "img_fn": f"{i}.jpg",
                "img_size": [320, 320],
                "bbox": b.tolist(),
                "det_labels": rng.randint(0, 10, k).tolist(),
                "rel": [[0, 1, int(rng.randint(0, 5))]],
            }
        )
    with open(d / "ann.json", "w") as f:
        json.dump(annos, f)
    with open(d / "cate.json", "w") as f:
        json.dump({"obj": [f"o{i}" for i in range(10)],
                   "rel": [f"r{i}" for i in range(5)]}, f)
    return str(d)


def test_oi_dataset_protocol(oi_dir):
    ds = OIDataset("train", os.path.join(oi_dir, "ann.json"),
                   os.path.join(oi_dir, "cate.json"))
    assert len(ds) == 6
    assert ds.ind_to_classes[0] == "__background__"
    rec = ds.get_groundtruth(0)
    assert rec["boxes"].shape[1] == 4
    assert (rec["labels"] >= 1).all()          # bg offset applied
    assert (rec["rel_tuples"][:, 2] >= 1).all()
    stats = ds.get_statistics()
    assert stats["fg_matrix"].shape[0] == len(ds.ind_to_classes)


def test_voc_ap_known_value():
    # single detection, single GT, matched: AP = 1
    assert _voc_ap(np.array([1.0]), np.array([1.0])) == pytest.approx(1.0)
    # rec .5 with prec 1, then rec 1 with prec .5 → AP = .5*1 + .5*.5
    assert _voc_ap(np.array([0.5, 1.0]), np.array([1.0, 0.5])) == pytest.approx(0.75)


def test_oi_evaluator_perfect_and_miss():
    ev = OIEvaluator(num_rel_classes=4)
    sbj = np.array([[0, 0, 50, 50]], np.float32)
    obj = np.array([[60, 60, 120, 120]], np.float32)
    # image 1: perfect match on predicate 1
    ev.add_image(sbj, obj, np.array([2]), np.array([3]), np.array([1]),
                 np.array([0.9]), sbj, obj, np.array([2]), np.array([3]),
                 np.array([1]))
    # image 2: wrong subject label → FP for predicate 2
    ev.add_image(sbj, obj, np.array([5]), np.array([3]), np.array([2]),
                 np.array([0.8]), sbj, obj, np.array([2]), np.array([3]),
                 np.array([2]))
    agg = ev.aggregate()
    # class 1 AP = 1, class 2 AP = 0; weighted by equal npos
    assert agg["mAP_rel"] == pytest.approx(0.5)
    assert agg["wmAP_rel"] == pytest.approx(0.5)
    assert agg["mAP_phr"] == pytest.approx(0.5)
    assert agg["R@50"] == pytest.approx(0.5)
    assert agg["score"] == pytest.approx(0.2 * 0.5 + 0.4 * 0.5 + 0.4 * 0.5)


def test_oi_evaluator_duplicate_detection_is_fp():
    ev = OIEvaluator(num_rel_classes=3)
    sbj = np.array([[0, 0, 50, 50], [0, 0, 50, 50]], np.float32)
    obj = np.array([[60, 60, 120, 120], [60, 60, 120, 120]], np.float32)
    ev.add_image(sbj, obj, np.array([1, 1]), np.array([2, 2]), np.array([1, 1]),
                 np.array([0.9, 0.8]), sbj[:1], obj[:1], np.array([1]),
                 np.array([2]), np.array([1]))
    agg = ev.aggregate()
    # second duplicate is FP: precision drops after recall 1 → AP still 1.0
    assert agg["mAP_rel"] == pytest.approx(1.0)
