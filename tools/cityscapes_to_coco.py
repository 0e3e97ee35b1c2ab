"""Cityscapes gtFine → COCO instances json converter.

Re-implementation of the reference conversion tooling
(tools/cityscapes/convert_cityscapes_to_coco.py:119-230 and
instances2dict_with_polygons.py) without the cityscapesscripts
dependency: instance masks come straight from the ``*_instanceIds.png``
id maps (ids ≥ 1000 encode labelID*1000 + instance, ids < 1000 are
group/stuff and are skipped, matching the reference's ``continue``),
contours via cv2 RETR_EXTERNAL / CHAIN_APPROX_NONE, boxes via the
polygon hull with the TO_REMOVE=1 xywh convention.

Usage:
    python tools/cityscapes_to_coco.py --datadir /path/to/cityscapes \
        --outdir /path/to/out [--splits val train test]

Output: ``instancesonly_filtered_gtFine_<split>.json`` per split, the
file names the reference dataset catalog points at.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Tuple

import numpy as np

# cityscapes labelIDs with hasInstances=True (cityscapesscripts labels)
INSTANCE_LABELS = {
    24: "person",
    25: "rider",
    26: "car",
    27: "truck",
    28: "bus",
    31: "train",
    32: "motorcycle",
    33: "bicycle",
}
# the reference's category_instancesonly order (:143-152) — category ids
# are assigned first-seen while walking, so ordering is data-dependent
# there; we keep its canonical list order for determinism
CATEGORY_ORDER = ("person", "rider", "car", "truck", "bus", "train",
                  "motorcycle", "bicycle")


def poly_to_box(polys: List[List[float]]) -> Tuple[float, float, float, float]:
    """Tight xyxy box over all polygons (converter :50-57)."""
    x0 = min(min(p[::2]) for p in polys)
    x1 = max(max(p[::2]) for p in polys)
    y0 = min(min(p[1::2]) for p in polys)
    y1 = max(max(p[1::2]) for p in polys)
    return x0, y0, x1, y1


def xyxy_to_xywh(box) -> Tuple[float, float, float, float]:
    """xyxy → xywh with the TO_REMOVE=1 pixel convention (:60-64)."""
    x0, y0, x1, y1 = box
    return x0, y0, x1 - x0 + 1, y1 - y0 + 1


def extract_instances(id_map: np.ndarray) -> List[dict]:
    """All instance objects in one ``*_instanceIds.png`` array.

    Returns [{'label': name, 'contours': [poly...], 'pixelCount': n}],
    skipping group ids (< 1000), non-instance classes, empty contours and
    degenerate (≤ 4 coordinate) polygons — the same filters the reference
    applies (converter :189-197, instances2dict :42-57).
    """
    import cv2

    out = []
    for inst_id in np.unique(id_map):
        if inst_id < 1000:
            continue
        label_id = int(inst_id) // 1000
        name = INSTANCE_LABELS.get(label_id)
        if name is None:
            continue
        mask = (id_map == inst_id).astype(np.uint8)
        contours, _ = cv2.findContours(
            mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)
        polys = [c.reshape(-1).astype(float).tolist() for c in contours]
        polys = [p for p in polys if len(p) > 4]
        if not polys:
            continue
        out.append({
            "label": name,
            "contours": polys,
            "pixelCount": int(mask.sum()),
        })
    return out


def convert_split(data_dir: str, out_dir: str, split: str = "val",
                  quality: str = "gtFine") -> dict:
    """One split → one COCO dict, written to
    ``instancesonly_filtered_<quality>_<split>.json``."""
    from PIL import Image

    ann_dir = os.path.join(data_dir, quality, split)
    suffix = f"_{quality}_polygons.json"
    images, annotations = [], []
    cat_ids = {name: i + 1 for i, name in enumerate(CATEGORY_ORDER)}
    img_id = ann_id = 0
    for root, _, files in sorted(os.walk(ann_dir)):
        for filename in sorted(files):
            if not filename.endswith(suffix):
                continue
            meta = json.load(open(os.path.join(root, filename)))
            stem = filename[: -len(suffix)]
            image = {
                "id": img_id,
                "width": meta["imgWidth"],
                "height": meta["imgHeight"],
                "file_name": stem + "_leftImg8bit.png",
                "seg_file_name": stem + f"_{quality}_instanceIds.png",
            }
            img_id += 1
            images.append(image)
            id_map = np.asarray(
                Image.open(os.path.join(root, image["seg_file_name"])))
            for obj in extract_instances(id_map):
                xywh = xyxy_to_xywh(poly_to_box(obj["contours"]))
                annotations.append({
                    "id": ann_id,
                    "image_id": image["id"],
                    "segmentation": obj["contours"],
                    "category_id": cat_ids[obj["label"]],
                    "iscrowd": 0,
                    "area": obj["pixelCount"],
                    "bbox": list(xywh),
                })
                ann_id += 1
    coco = {
        "images": images,
        "categories": [{"id": i, "name": n} for n, i in cat_ids.items()],
        "annotations": annotations,
    }
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(
        out_dir, f"instancesonly_filtered_{quality}_{split}.json")
    with open(out_path, "w") as f:
        json.dump(coco, f)
    print(f"{split}: {len(images)} images, {len(annotations)} annotations "
          f"-> {out_path}")
    return coco


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--datadir", required=True)
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--splits", nargs="+", default=["val", "train", "test"])
    ap.add_argument("--quality", default="gtFine")
    args = ap.parse_args()
    for split in args.splits:
        convert_split(args.datadir, args.outdir, split, args.quality)


if __name__ == "__main__":
    main()
