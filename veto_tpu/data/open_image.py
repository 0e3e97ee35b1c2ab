"""Open Images VRD dataset reader (v4/v6).

Re-design of the reference OIDataset (pysgg/data/datasets/open_image.py:
121-427): annotations are one JSON list of records with ``img_fn`` /
``img_size``, ``bbox`` (xyxy, image coords), ``det_labels`` and ``rel``
triplet lists; the category file maps object/predicate names
(load_cate_info :34-49, bg prepended).  Exposes the same record protocol as
VGDataset/GQADataset so the loader, statistics, and evaluation stacks work
unchanged.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np


def load_oi_cate_info(cate_info_file: str):
    with open(cate_info_file) as f:
        info = json.load(f)
    obj = info["obj"] if "obj" in info else info.get("label_list", [])
    rel = info["rel"] if "rel" in info else info.get("predicate_list", [])
    if not obj or obj[0] != "__background__":
        obj = ["__background__"] + list(obj)
    if not rel or rel[0] != "__background__":
        rel = ["__background__"] + list(rel)
    return obj, rel


class OIDataset:
    def __init__(
        self,
        split: str,
        ann_file: str,
        cate_info_file: str,
        img_dir: str = "",
        num_im: int = -1,
        filter_empty_rels: bool = True,
        filter_duplicate_rels: bool = True,
        seed: int = 1,
    ):
        assert split in ("train", "val", "test")
        self.split = split
        self.img_dir = img_dir
        self.depth_img_dir = None
        self.filter_duplicate_rels = filter_duplicate_rels and split == "train"
        self.rng = np.random.RandomState(seed)
        self.ind_to_classes, self.ind_to_predicates = load_oi_cate_info(cate_info_file)

        with open(ann_file) as f:
            annotations = json.load(f)
        if num_im != -1:
            annotations = annotations[:num_im]

        self.filenames, self.img_info = [], []
        self.gt_boxes, self.gt_classes, self.relationships = [], [], []
        for anno in annotations:
            if filter_empty_rels and (
                len(anno.get("rel", [])) == 0 or len(anno.get("bbox", [])) == 0
            ):
                continue
            boxes = np.asarray(anno["bbox"], np.float32).reshape(-1, 4)
            labels = np.asarray(anno["det_labels"], np.int64) + 1  # bg offset
            rels = np.asarray(anno["rel"], np.int64).reshape(-1, 3)
            rels = rels.copy()
            rels[:, 2] += 1  # predicate bg offset (reference :103-110)
            size = anno.get("img_size", [1024, 1024])
            self.filenames.append(anno.get("img_fn", ""))
            self.img_info.append(
                {"width": int(size[0]), "height": int(size[1]),
                 "image_id": len(self.filenames) - 1}
            )
            self.gt_boxes.append(boxes)
            self.gt_classes.append(labels)
            self.relationships.append(rels)
        self.idx_list = list(range(len(self.img_info)))
        self.repeat_dict = None

    def __len__(self) -> int:
        return len(self.idx_list)

    def get_groundtruth(self, index: int, inner_idx: bool = True) -> Dict:
        if not inner_idx:
            index = self.idx_list[index]
        info = self.img_info[index]
        boxes = self.gt_boxes[index].copy()
        relation = self.relationships[index].copy()
        if self.filter_duplicate_rels:
            seen = {}
            for s, o, p in relation:
                seen.setdefault((int(s), int(o)), []).append(int(p))
            relation = np.array(
                [(s, o, self.rng.choice(ps)) for (s, o), ps in seen.items()],
                dtype=np.int64,
            )
        n = len(boxes)
        rel_matrix = np.zeros((n, n), np.int64)
        for i in range(relation.shape[0]):
            s, o, p = (int(v) for v in relation[i])
            if rel_matrix[s, o] == 0 or self.rng.rand() > 0.5:
                rel_matrix[s, o] = p
        return {
            "boxes": boxes.astype(np.float32),
            "labels": self.gt_classes[index].astype(np.int32),
            "attributes": np.zeros((n, 10), np.int64),
            "rel_matrix": rel_matrix,
            "rel_tuples": relation,
            "size": np.array([info["width"], info["height"]], np.int32),
            "image_id": info["image_id"],
        }

    def load_image(self, index: int) -> np.ndarray:
        from PIL import Image

        path = os.path.join(self.img_dir, os.path.basename(self.filenames[index]))
        img = Image.open(path).convert("RGB")
        return np.asarray(img, np.float32) / 255.0

    def load_depth(self, index: int) -> Optional[np.ndarray]:
        return None

    def get_statistics(self, must_overlap: bool = True):
        from .statistics import co_occurrence_matrices

        return co_occurrence_matrices(self, must_overlap=must_overlap)
