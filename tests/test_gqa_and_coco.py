"""GQA reader (fixture JSONs) + NumPy COCO-mAP evaluator tests."""

import json
import os

import numpy as np
import pytest

from veto_tpu.data.gqa import GQADataset
from veto_tpu.evaluation.coco_map import CocoMapEvaluator


@pytest.fixture(scope="module")
def gqa_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("gqa")
    rng = np.random.RandomState(0)
    n_train, n_eval = 10, 8

    def make(n):
        fns, infos, boxes, classes, rels = [], [], [], [], []
        for i in range(n):
            k = rng.randint(2, 5)
            b = np.sort(rng.uniform(0, 300, (k, 2, 2)), axis=1).reshape(k, 4)
            b[:, 2:] += 10
            fns.append(f"{i}.jpg")
            infos.append({"width": 320, "height": 320, "image_id": i})
            boxes.append(b.tolist())
            classes.append(rng.randint(1, 20, k).tolist())
            rels.append([[0, 1, int(rng.randint(1, 10))]])
        return {
            "filenames_all": fns, "img_info_all": infos, "gt_boxes_all": boxes,
            "gt_classes_all": classes, "relationships_all": rels,
        }

    with open(d / "train.json", "w") as f:
        json.dump(make(n_train), f)
    with open(d / "test.json", "w") as f:
        json.dump(make(n_eval), f)
    with open(d / "dicts.json", "w") as f:
        json.dump(
            {
                "label_to_idx": {f"obj{i}": i for i in range(1, 21)},
                "predicate_to_idx": {f"rel{i}": i for i in range(1, 11)},
            },
            f,
        )
    return str(d)


def test_gqa_dataset_protocol(gqa_dir):
    ds = GQADataset(
        "train",
        dict_file=os.path.join(gqa_dir, "dicts.json"),
        train_file=os.path.join(gqa_dir, "train.json"),
        test_file=os.path.join(gqa_dir, "test.json"),
        num_val_im=3,
    )
    assert len(ds) == 10
    assert ds.ind_to_classes[0] == "__background__"
    assert len(ds.ind_to_classes) == 21 and len(ds.ind_to_predicates) == 11
    rec = ds.get_groundtruth(0)
    assert rec["boxes"].shape[1] == 4
    assert rec["rel_matrix"].shape == (len(rec["boxes"]),) * 2
    assert (rec["rel_tuples"][:, 2] > 0).all()
    stats = ds.get_statistics()
    assert stats["fg_matrix"].shape == (21, 21, 11)

    val = GQADataset(
        "val", dict_file=os.path.join(gqa_dir, "dicts.json"),
        train_file=os.path.join(gqa_dir, "train.json"),
        test_file=os.path.join(gqa_dir, "test.json"), num_val_im=3,
    )
    test = GQADataset(
        "test", dict_file=os.path.join(gqa_dir, "dicts.json"),
        train_file=os.path.join(gqa_dir, "train.json"),
        test_file=os.path.join(gqa_dir, "test.json"), num_val_im=3,
    )
    # val = first 3 eval records, test = the rest (load_graphs :348-356)
    assert len(val) == 3 and len(test) == 5


def test_coco_map_perfect_detections():
    ev = CocoMapEvaluator(num_classes=5)
    gt = np.array([[0, 0, 50, 50], [100, 100, 160, 160]], np.float32)
    labels = np.array([1, 2])
    ev.add_image(gt, labels, gt, labels, np.array([0.9, 0.8]))
    agg = ev.aggregate()
    assert agg["mAP"] == pytest.approx(1.0)
    assert agg["AP50"] == pytest.approx(1.0)


def test_coco_map_localization_quality():
    """A detection at IoU ~0.6 counts at AP50 but not AP75."""
    ev = CocoMapEvaluator(num_classes=3)
    gt = np.array([[0, 0, 100, 100]], np.float32)
    det = np.array([[0, 0, 100, 62]], np.float32)  # IoU = 0.62
    ev.add_image(gt, np.array([1]), det, np.array([1]), np.array([0.9]))
    agg = ev.aggregate()
    assert agg["AP50"] == pytest.approx(1.0)
    assert agg["AP75"] == pytest.approx(0.0)
    assert 0.0 < agg["mAP"] < 1.0


def test_coco_map_false_positive_penalty():
    ev = CocoMapEvaluator(num_classes=3)
    gt = np.array([[0, 0, 100, 100]], np.float32)
    dets = np.array([[200, 200, 300, 300], [0, 0, 100, 100]], np.float32)
    # FP scored higher than the TP: precision at recall 1 is 0.5
    ev.add_image(gt, np.array([1]), dets, np.array([1, 1]), np.array([0.9, 0.8]))
    agg = ev.aggregate()
    assert agg["AP50"] == pytest.approx(0.5, abs=0.01)


def test_coco_map_missing_class_counts_zero():
    ev = CocoMapEvaluator(num_classes=4)
    gt = np.array([[0, 0, 100, 100]], np.float32)
    ev.add_image(gt, np.array([1]), gt, np.array([1]), np.array([0.9]))
    # class 2 has GT but never any detection
    ev.add_image(gt, np.array([2]), np.zeros((0, 4)), np.zeros(0, int), np.zeros(0))
    agg = ev.aggregate()
    assert agg["AP50"] == pytest.approx(0.5)  # mean over classes 1 (AP 1) and 2 (AP 0)


# ----------------------------------------------------------------------
# COCO detection dataset (veto_tpu/data/coco.py vs reference coco.py)
# ----------------------------------------------------------------------
@pytest.fixture
def coco_dir(tmp_path):
    import json

    from PIL import Image

    img_dir = tmp_path / "train2017"
    img_dir.mkdir()
    for name in ("a.jpg", "b.jpg", "c.jpg"):
        Image.new("RGB", (40, 30), (128, 64, 32)).save(img_dir / name)
    ann = {
        "images": [
            {"id": 7, "file_name": "a.jpg", "width": 40, "height": 30},
            {"id": 3, "file_name": "b.jpg", "width": 40, "height": 30},
            {"id": 9, "file_name": "c.jpg", "width": 40, "height": 30},
        ],
        # non-contiguous json category ids (real COCO skips ids)
        "categories": [
            {"id": 11, "name": "cat"},
            {"id": 2, "name": "dog"},
            {"id": 55, "name": "bird"},
        ],
        "annotations": [
            # image 3: one valid box + a crowd box (filtered)
            {"id": 1, "image_id": 3, "category_id": 2,
             "bbox": [5, 5, 10, 12], "iscrowd": 0},
            {"id": 2, "image_id": 3, "category_id": 11,
             "bbox": [0, 0, 20, 20], "iscrowd": 1},
            # image 7: two valid boxes, one exceeding the image (clipped)
            {"id": 3, "image_id": 7, "category_id": 55,
             "bbox": [2, 2, 8, 8], "iscrowd": 0},
            {"id": 4, "image_id": 7, "category_id": 11,
             "bbox": [30, 20, 50, 50], "iscrowd": 0},
            # image 9: only a degenerate box → image dropped
            {"id": 5, "image_id": 9, "category_id": 2,
             "bbox": [1, 1, 1, 0.5], "iscrowd": 0},
        ],
    }
    ann_dir = tmp_path / "annotations"
    ann_dir.mkdir()
    with open(ann_dir / "instances_train2017.json", "w") as f:
        json.dump(ann, f)
    return tmp_path


def test_coco_dataset_protocol(coco_dir):
    from veto_tpu.data.coco import COCODetDataset

    ds = COCODetDataset(
        ann_file=str(coco_dir / "annotations" / "instances_train2017.json"),
        img_dir=str(coco_dir / "train2017"),
    )
    # image 9 dropped (only degenerate box); ids sorted → [3, 7]
    assert len(ds) == 2
    assert ds.filenames == ["b.jpg", "a.jpg"]
    # contiguous 1-based labels in sorted-json-id order: 2→1, 11→2, 55→3
    assert ds.json_to_contiguous == {2: 1, 11: 2, 55: 3}
    rec0 = ds.get_groundtruth(0)
    assert list(rec0["labels"]) == [1]  # crowd filtered, dog → 1
    np.testing.assert_allclose(rec0["boxes"][0], [5, 5, 14, 16])  # w-1 conv
    rec1 = ds.get_groundtruth(1)
    # second box clipped to image bounds
    np.testing.assert_allclose(rec1["boxes"][1], [30, 20, 39, 29])
    assert rec1["rel_tuples"].shape == (0, 3)
    img = ds.load_image(0)
    assert img.shape == (30, 40, 3)


def test_build_dataset_dispatch(coco_dir, tmp_path, monkeypatch):
    """COCO and OI dataset names route to the right reader (VERDICT #8:
    every dataset the readers support must be reachable from the tools)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from relation_train_net import build_dataset

    from veto_tpu.config.defaults import Config
    from veto_tpu.data.coco import COCODetDataset

    cfg = Config()
    cfg.data.data_dir = str(coco_dir)
    cfg.data.dataset = "COCO2017"
    ds = build_dataset(cfg, "train")
    assert isinstance(ds, COCODetDataset) and len(ds) == 2
