"""cityscapes → COCO converter: synthetic gtFine tree end-to-end."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from cityscapes_to_coco import (  # noqa: E402
    convert_split,
    extract_instances,
    poly_to_box,
    xyxy_to_xywh,
)


def _make_split(tmp_path):
    from PIL import Image

    city = tmp_path / "gtFine" / "val" / "toytown"
    city.mkdir(parents=True)
    id_map = np.zeros((32, 48), np.int32)
    id_map[4:12, 6:20] = 26001          # car instance
    id_map[20:30, 30:44] = 24000        # person instance 0
    id_map[2:4, 40:43] = 25             # group id (< 1000): skipped
    Image.fromarray(id_map).save(
        city / "toytown_000000_000019_gtFine_instanceIds.png")
    (city / "toytown_000000_000019_gtFine_polygons.json").write_text(
        json.dumps({"imgWidth": 48, "imgHeight": 32, "objects": []}))
    return tmp_path


def test_extract_instances_filters():
    id_map = np.zeros((16, 16), np.int32)
    id_map[2:8, 2:8] = 26001
    id_map[0, 0] = 24        # group id: skipped
    id_map[10:12, 10:12] = 99001  # not an instance class: skipped
    objs = extract_instances(id_map)
    assert [o["label"] for o in objs] == ["car"]
    assert objs[0]["pixelCount"] == 36
    # CHAIN_APPROX_NONE contour traces the mask border
    x0, y0, x1, y1 = poly_to_box(objs[0]["contours"])
    assert (x0, y0, x1, y1) == (2, 2, 7, 7)
    assert xyxy_to_xywh((x0, y0, x1, y1)) == (2, 2, 6, 6)


def test_convert_split_end_to_end(tmp_path):
    data_dir = _make_split(tmp_path)
    out = convert_split(str(data_dir), str(tmp_path / "out"), "val")
    written = json.load(open(
        tmp_path / "out" / "instancesonly_filtered_gtFine_val.json"))
    assert written == out
    assert len(out["images"]) == 1
    img = out["images"][0]
    assert img["file_name"].endswith("_leftImg8bit.png")
    assert (img["width"], img["height"]) == (48, 32)
    assert len(out["annotations"]) == 2
    by_cat = {a["category_id"]: a for a in out["annotations"]}
    cats = {c["name"]: c["id"] for c in out["categories"]}
    car = by_cat[cats["car"]]
    person = by_cat[cats["person"]]
    assert car["area"] == 8 * 14 and person["area"] == 10 * 14
    assert tuple(car["bbox"]) == (6, 4, 14, 8)      # TO_REMOVE=1 widths
    assert tuple(person["bbox"]) == (30, 20, 14, 10)
    assert car["iscrowd"] == 0 and car["image_id"] == img["id"]
