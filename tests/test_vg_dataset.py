"""VG reader semantics against a fabricated tiny VG-SGG h5
(reference load_graphs, visual_genome.py:538-666)."""

import json
import os

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from veto_tpu.data.predicate_stats import VG_PREDICATE_NEW_ORDER
from veto_tpu.data.visual_genome import BOX_SCALE, VGDataset, load_graphs


NUM_IMAGES = 12


@pytest.fixture(scope="module")
def fake_vg(tmp_path_factory):
    """10 train + 2 test images, 3 boxes and 2 relations each."""
    root = tmp_path_factory.mktemp("vg")
    rng = np.random.RandomState(0)

    boxes, labels, attrs = [], [], []
    first_box, last_box, first_rel, last_rel = [], [], [], []
    rel_pairs, rel_preds = [], []
    split = []
    meta = []
    for i in range(NUM_IMAGES):
        split.append(0 if i < 10 else 2)
        n = 3
        first_box.append(len(labels))
        for _ in range(n):
            cx, cy = rng.uniform(200, 800, 2)
            w, h = rng.uniform(100, 300, 2)
            boxes.append([cx, cy, w, h])
            labels.append(rng.randint(1, 151))
            attrs.append(np.zeros(10, np.int64))
        last_box.append(len(labels) - 1)
        first_rel.append(len(rel_preds))
        base = first_box[-1]
        rel_pairs.append([base + 0, base + 1])
        rel_preds.append(20)  # old id 20 → freq rank 2
        rel_pairs.append([base + 1, base + 2])
        rel_preds.append(31)  # old id 31 → freq rank 1
        last_rel.append(len(rel_preds) - 1)
        meta.append({"image_id": 1000 + i, "width": 1024, "height": 768})

    h5path = str(root / "VG-SGG.h5")
    with h5py.File(h5path, "w") as f:
        f["split"] = np.array(split)
        f["img_to_first_box"] = np.array(first_box)
        f["img_to_last_box"] = np.array(last_box)
        f["img_to_first_rel"] = np.array(first_rel)
        f["img_to_last_rel"] = np.array(last_rel)
        f[f"boxes_{BOX_SCALE}"] = np.array(boxes, np.float32)
        f["labels"] = np.array(labels)[:, None]
        f["attributes"] = np.stack(attrs)
        f["relationships"] = np.array(rel_pairs)
        f["predicates"] = np.array(rel_preds)[:, None]

    dict_file = str(root / "dicts.json")
    with open(dict_file, "w") as f:
        json.dump(
            {
                "label_to_idx": {f"obj{i}": i for i in range(1, 151)},
                "predicate_to_idx": {f"rel{i}": i for i in range(1, 51)},
            },
            f,
        )
    image_file = str(root / "image_data.json")
    with open(image_file, "w") as f:
        json.dump(meta, f)
    return h5path, dict_file, image_file


class TestLoadGraphs:
    def test_split_and_val_carveout(self, fake_vg):
        h5path, _, _ = fake_vg
        idx_tr, *_ = load_graphs(h5path, "train", num_val_im=4,
                                 filter_non_overlap=False)
        idx_val, *_ = load_graphs(h5path, "val", num_val_im=4,
                                  filter_non_overlap=False)
        idx_te, *_ = load_graphs(h5path, "test", num_val_im=4,
                                 filter_non_overlap=False)
        assert len(idx_tr) == 6 and len(idx_val) == 4 and len(idx_te) == 2
        assert set(idx_val).isdisjoint(idx_tr)
        assert set(idx_te) == {10, 11}

    def test_box_conversion_and_reorder(self, fake_vg):
        h5path, _, _ = fake_vg
        _, boxes, classes, _, rels = load_graphs(
            h5path, "test", num_val_im=0, filter_non_overlap=False
        )
        b = boxes[0]
        assert np.all(b[:, 2] > b[:, 0]) and np.all(b[:, 3] > b[:, 1])
        # predicate reorder: old 20 → VG_PREDICATE_NEW_ORDER[20], old 31 → [31]
        assert rels[0][0, 2] == VG_PREDICATE_NEW_ORDER[20]
        assert rels[0][1, 2] == VG_PREDICATE_NEW_ORDER[31]
        # without reorder the raw ids survive
        _, _, _, _, rels_raw = load_graphs(
            h5path, "test", num_val_im=0, filter_non_overlap=False,
            reorder_freq_based=False,
        )
        assert rels_raw[0][0, 2] == 20


class TestVGDataset:
    def test_groundtruth_record(self, fake_vg):
        h5path, dict_file, image_file = fake_vg
        ds = VGDataset("test", h5path, dict_file, image_file, num_val_im=0,
                       filter_non_overlap=False)
        assert len(ds) == 2
        rec = ds.get_groundtruth(0)
        # boxes recovered via /BOX_SCALE*max(w,h) (visual_genome.py:317)
        assert rec["boxes"].max() <= 1024 * 1.5
        assert rec["rel_matrix"].shape == (3, 3)
        s, o, p = rec["rel_tuples"][0]
        assert rec["rel_matrix"][s, o] == p
        assert rec["size"].tolist() == [1024, 768]

    def test_statistics(self, fake_vg):
        h5path, dict_file, image_file = fake_vg
        ds = VGDataset("train", h5path, dict_file, image_file, num_val_im=2,
                       filter_non_overlap=False)
        stats = ds.get_statistics()
        assert stats["fg_matrix"].shape == (151, 151, 51)
        assert stats["fg_matrix"].sum() == 2 * len(ds.img_info)
        assert len(stats["rel_classes"]) == 51

    def test_resampling_repeats(self, fake_vg):
        h5path, dict_file, image_file = fake_vg
        ds = VGDataset(
            "train", h5path, dict_file, image_file, num_val_im=2,
            filter_non_overlap=False,
            resampling={"repeat_factor": 0.5, "instance_drop_rate": 1.6},
        )
        # rare classes repeat: index list at least as long as base image count
        assert len(ds.idx_list) >= len(ds.img_info)
        rec = ds.get_groundtruth(0, inner_idx=False)
        assert "rel_matrix" in rec
