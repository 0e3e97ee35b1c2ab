"""Image-retrieval preprocessing (reference
pysgg/image_retrieval/preprocessing.py:1-202, dataloader.py:34-50)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from veto_tpu.retrieval.preprocessing import (
    build_vocabs,
    detect_sg_from_prediction,
    generate_detect_sg,
    generate_gt_sg,
    generate_txt_img_sg,
    img_coco_mapping,
    pairs_records,
    split_keys,
)

IDX_TO_LABEL = {"1": "man", "2": "dog", "3": "hat"}
IDX_TO_META = {"1": "on", "2": "has", "3": "wearing"}


def _cap_graph():
    return {
        "vg_image_ids": [10, 11, 12],
        "vg_coco_ids": [100, 111, 122],
        "vg_valids": [1, 1, 0],
        "idx_to_meta_predicate": IDX_TO_META,
        "cap_predicate": {"on top of": 1, "with": 1},
        "cap_category": {"person": 1, "animal": 1, "clothing": 1},
        "vg_coco_id_to_capgraphs": {
            "100": [{"entities": ["person", "clothing"],
                     "relations": [[0, 1, "with"]]}],
            "111": [{"entities": ["animal"], "relations": []}],
        },
    }


def _vg_dict():
    return {"idx_to_label": IDX_TO_LABEL}


def test_detect_sg_quirks():
    """Threshold drop + reindex, bg-argmax drop, duplicate-pair
    last-write-wins (preprocessing.py:128-156)."""
    obj_labels = np.array([1, 2, 3])
    obj_scores = np.array([0.9, 0.05, 0.5])  # dog below obj_thres=0.1
    rel_pairs = np.array([[0, 2], [0, 1], [0, 2]])
    # pair 0: predicate 1; pair 1: touches dropped obj; pair 2 overwrites
    # pair 0 with predicate 3.  A bg-argmax pair would get label 0.
    rel_scores = np.array([
        [0.1, 0.8, 0.05, 0.05],
        [0.1, 0.1, 0.7, 0.1],
        [0.05, 0.05, 0.1, 0.8],
    ])
    sg = detect_sg_from_prediction(
        obj_labels, obj_scores, rel_pairs, rel_scores,
        IDX_TO_LABEL, IDX_TO_META, obj_thres=0.1,
    )
    assert sg["entities"] == ["man", "hat"]
    # only the (man, hat) pair survives, with the LAST prediction (wearing)
    assert sg["relations"] == [[0, 1, "wearing"]]

    # background-argmax pairs are dropped by the rel_matrix > 0 filter
    sg_bg = detect_sg_from_prediction(
        obj_labels, obj_scores, np.array([[0, 2]]),
        np.array([[0.9, 0.03, 0.03, 0.04]]),
        IDX_TO_LABEL, IDX_TO_META,
    )
    assert sg_bg["relations"] == []


def test_generate_detect_and_pairing():
    cap = _cap_graph()
    vg = _vg_dict()
    preds = [
        {"image_id": 10, "obj_labels": [1, 3], "obj_scores": [0.9, 0.8],
         "rel_pairs": [[0, 1]], "rel_scores": [[0.1, 0.1, 0.1, 0.7]]},
        {"image_id": 12, "obj_labels": [2], "obj_scores": [0.9],
         "rel_pairs": [], "rel_scores": []},   # invalid vg id -> skipped
        {"image_id": 11, "obj_labels": [2], "obj_scores": [0.9],
         "rel_pairs": [], "rel_scores": []},
    ]
    img_sg = generate_detect_sg(preds, cap, vg)
    assert set(img_sg) == {"100", "111"}
    assert img_sg["100"][0]["relations"] == [[0, 1, "wearing"]]

    vocabs = build_vocabs(cap, vg)
    paired = generate_txt_img_sg(img_sg, cap, vocabs)
    assert set(paired) == {"100", "111"}
    rec = paired["100"]
    # entity ids are class ids from the sorted vocab; relation endpoints
    # are CLASS ids, not node indices (preprocessing.py:170-176)
    man, hat = vocabs.sgg_obj2id["man"], vocabs.sgg_obj2id["hat"]
    assert rec["img"]["entities"] == [man, hat]
    assert rec["img"]["relations"] == [
        [man, hat, vocabs.sgg_rel2id["wearing"]]]
    person = vocabs.txt_obj2id["person"]
    clothing = vocabs.txt_obj2id["clothing"]
    assert rec["txt"]["entities"] == [person, clothing]
    assert rec["txt"]["relations"] == [
        [person, clothing, vocabs.txt_rel2id["with"]]]

    assert img_coco_mapping(cap)[11] == 111
    recs = pairs_records(paired)
    assert len(recs) == 2 and recs[0] is paired["100"]


def test_generate_gt_sg():
    cap = _cap_graph()
    h5 = {
        "img_to_first_box": np.array([0, 2, -1]),
        "img_to_last_box": np.array([1, 2, -1]),
        "img_to_first_rel": np.array([0, -1, -1]),
        "img_to_last_rel": np.array([0, -1, -1]),
        "labels": np.array([1, 3, 2]),
        "relationships": np.array([[0, 1]]),
        "predicates": np.array([3]),
    }
    out = generate_gt_sg(cap, _vg_dict(), h5)
    # image 1 has no rels (first_rel -1) and image 2 is invalid
    assert set(out) == {"100"}
    assert out["100"][0]["entities"] == ["man", "hat"]
    assert out["100"][0]["relations"] == [[0, 1, "wearing"]]


def test_split_keys_rule():
    keys = [f"k{i:02d}" for i in range(10)]
    test_ids = keys[:6]
    test = split_keys(keys, test_ids, "test", num_test=3, num_val=2)
    val = split_keys(keys, test_ids, "val", num_test=3, num_val=2)
    train = split_keys(keys, test_ids, "train", num_test=3, num_val=2)
    assert test == keys[:3]
    assert val == keys[3:5]
    # train = test remainder + non-test keys, disjoint from test/val
    assert set(train) == set(keys[5:])
    assert not (set(train) & set(test)) and not (set(train) & set(val))


def test_preprocess_tool_end_to_end(tmp_path):
    """`image_retrieval_main.py --preprocess` runs from the caption-graph
    artifacts + dumped predictions and produces a trainable pair file."""
    cap_p = tmp_path / "capgraph.json"
    dict_p = tmp_path / "vgdict.json"
    pred_p = tmp_path / "preds.jsonl"
    out_p = tmp_path / "pairs.json"
    json.dump(_cap_graph(), open(cap_p, "w"))
    json.dump(_vg_dict(), open(dict_p, "w"))
    with open(pred_p, "w") as f:
        f.write(json.dumps({
            "image_id": 10, "obj_labels": [1, 3], "obj_scores": [0.9, 0.8],
            "rel_pairs": [[0, 1]], "rel_scores": [[0.1, 0.1, 0.1, 0.7]],
        }) + "\n")
        f.write(json.dumps({
            "image_id": 11, "obj_labels": [2], "obj_scores": [0.9],
            "rel_pairs": [], "rel_scores": [],
        }) + "\n")
    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "image_retrieval_main.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, tool, "--preprocess", "--capgraph", str(cap_p),
         "--vg-dict", str(dict_p), "--predictions", str(pred_p),
         "--out", str(out_p)],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    records = json.load(open(out_p))
    assert len(records) == 2
    assert all({"img", "txt"} <= set(rec) for rec in records)
    assert records[0]["img"]["relations"][0][2] >= 1
