"""Concat/List datasets (reference concat_dataset.py:1-23,
list_dataset.py:1-36) + the tool's '+'-dataset wiring."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from veto_tpu.data.compound import ConcatDataset, ListDataset


class _Fake:
    """Minimal duck-typed dataset with an idx_list remap (like a resampled
    VG split) so routing through inner indices is exercised."""

    def __init__(self, n, base, repeat_first=False):
        self.n = n
        self.base = base
        self.idx_list = list(range(n))
        if repeat_first:
            self.idx_list = [0] + self.idx_list
        self.img_info = [
            {"width": 10 + i, "height": 20 + i} for i in range(n)
        ]

    def __len__(self):
        return len(self.idx_list)

    def get_groundtruth(self, index, inner_idx=False):
        inner = self.idx_list[index]
        return {"image_id": self.base + inner,
                "boxes": np.zeros((1, 4), np.float32)}

    def load_image(self, inner):
        return np.full((4, 4, 3), self.base + inner, np.float32)

    def load_depth(self, inner):
        return None


def test_concat_dataset_routing():
    a, b = _Fake(3, 100, repeat_first=True), _Fake(2, 200)
    ds = ConcatDataset([a, b])
    assert len(ds) == 6  # 4 (resampled) + 2
    # bisect rule (concat_dataset.py:13-19)
    assert ds.get_idxs(0) == (0, 0)
    assert ds.get_idxs(3) == (0, 3)
    assert ds.get_idxs(4) == (1, 0)
    assert ds.get_idxs(5) == (1, 1)
    # groundtruth + image route through each part's own idx_list
    ids = [ds.get_groundtruth(i)["image_id"] for i in range(6)]
    assert ids == [100, 100, 101, 102, 200, 201]
    assert ds.load_image(1)[0, 0, 0] == 100  # repeated first sample
    assert ds.load_image(5)[0, 0, 0] == 201
    assert ds.get_img_info(4)["width"] == 10


def test_list_dataset(tmp_path):
    from PIL import Image

    paths = []
    for i, size in enumerate([(16, 12), (8, 20)]):
        p = tmp_path / f"im{i}.png"
        Image.new("RGB", size, (i, i, i)).save(p)
        paths.append(str(p))
    ds = ListDataset(paths)
    assert len(ds) == 2
    rec = ds.get_groundtruth(1)
    np.testing.assert_array_equal(rec["boxes"], [[0, 0, 8, 20]])
    assert rec["rel_tuples"].shape == (0, 3)
    assert ds.load_image(0).shape == (12, 16, 3)
    assert ds.load_depth(0) is None


def test_build_dataset_concatenates_voc_years(tmp_path, monkeypatch):
    """data.dataset=VOC2007+VOC2012 → ConcatDataset over both devkits."""
    from PIL import Image

    from relation_train_net import build_dataset
    from veto_tpu.config.defaults import load_config

    for year, n in (("2007", 2), ("2012", 1)):
        root = tmp_path / f"VOC{year}"
        (root / "Annotations").mkdir(parents=True)
        (root / "JPEGImages").mkdir()
        (root / "ImageSets" / "Main").mkdir(parents=True)
        names = []
        for i in range(n):
            nm = f"{year}_{i}"
            names.append(nm)
            (root / "Annotations" / f"{nm}.xml").write_text(
                "<annotation><size><width>30</width><height>20</height>"
                "</size><object><name>dog</name><difficult>0</difficult>"
                "<bndbox><xmin>2</xmin><ymin>2</ymin><xmax>20</xmax>"
                "<ymax>15</ymax></bndbox></object></annotation>"
            )
            Image.new("RGB", (30, 20)).save(root / "JPEGImages" / f"{nm}.jpg")
        (root / "ImageSets" / "Main" / "train.txt").write_text(
            "\n".join(names) + "\n")
        (root / "ImageSets" / "Main" / "val.txt").write_text(names[0] + "\n")

    cfg = load_config(None, [
        f"data.data_dir={tmp_path}", "data.dataset=VOC2007+VOC2012",
    ])
    ds = build_dataset(cfg, "train")
    assert isinstance(ds, ConcatDataset)
    assert len(ds) == 3
    assert ds.load_image(2).shape == (20, 30, 3)
    # val/test fall back to the first part
    val = build_dataset(cfg, "val")
    assert not isinstance(val, ConcatDataset)
