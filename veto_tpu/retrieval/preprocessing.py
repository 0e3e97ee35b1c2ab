"""Caption-graph ↔ detected-scene-graph pair construction.

Port of the reference's image-retrieval preprocessing
(pysgg/image_retrieval/preprocessing.py:1-202) and the SGEncoding split
rule (image_retrieval/dataloader.py:34-50), freed of its hard-coded
absolute paths: every input is an argument, every output a plain dict.

Inputs (same artifacts the reference consumes):
  * ``cap_graph`` — the causal-TDE ``vg_capgraphs_anno.json``: COCO-caption
    scene graphs (``vg_coco_id_to_capgraphs``), VG↔COCO id maps
    (``vg_image_ids``/``vg_coco_ids``/``vg_valids``), caption vocabularies
    (``cap_category``/``cap_predicate``), and the 51→meta predicate map
    (``idx_to_meta_predicate``).
  * ``vg_dict`` — ``VG-SGG-dicts-with-attri.json`` (``idx_to_label``).
  * per-image sgdet predictions (labels/scores/pairs/rel-score matrices) —
    produced by ``tools/relation_test_net.py --save-retrieval-predictions``.

One deliberate fix: the reference builds vocabularies with ``list(set(…))``
whose order varies per interpreter run, silently shuffling entity ids
between preprocessing and training runs; here vocabularies are sorted, so
ids are stable across processes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence

import numpy as np


@dataclass
class Vocabs:
    """1-based vocabularies (0 is the pad id, as in the reference)."""

    sgg_obj2id: Dict[str, int]
    txt_obj2id: Dict[str, int]
    sgg_rel2id: Dict[str, int]
    txt_rel2id: Dict[str, int]

    @property
    def sizes(self):
        return {
            "sgg_obj": len(self.sgg_obj2id),
            "txt_obj": len(self.txt_obj2id),
            "sgg_rel": len(self.sgg_rel2id),
            "txt_rel": len(self.txt_rel2id),
        }


def build_vocabs(cap_graph: Dict, vg_dict: Dict) -> Vocabs:
    """Vocabularies (preprocessing.py:48-73), sorted for determinism."""
    sgg_rel = sorted(set(cap_graph["idx_to_meta_predicate"].values()))
    txt_rel = sorted(set(cap_graph["cap_predicate"].keys()))
    sgg_obj = sorted(set(vg_dict["idx_to_label"].values()))
    txt_obj = sorted(set(cap_graph["cap_category"].keys()))
    return Vocabs(
        sgg_obj2id={k: i + 1 for i, k in enumerate(sgg_obj)},
        txt_obj2id={k: i + 1 for i, k in enumerate(txt_obj)},
        sgg_rel2id={k: i + 1 for i, k in enumerate(sgg_rel)},
        txt_rel2id={k: i + 1 for i, k in enumerate(txt_rel)},
    )


def img_coco_mapping(cap_graph: Dict) -> Dict[int, int]:
    """VG image id → COCO id (preprocessing.py:185-189)."""
    return {
        int(img_id): int(coco_id)
        for img_id, coco_id in zip(
            cap_graph["vg_image_ids"], cap_graph["vg_coco_ids"])
    }


def valid_vg_ids(cap_graph: Dict) -> set:
    """VG ids with caption graphs (preprocessing.py:195-198)."""
    return {
        int(img_id)
        for img_id, val in zip(cap_graph["vg_image_ids"], cap_graph["vg_valids"])
        if val > 0
    }


def detect_sg_from_prediction(
    obj_labels: np.ndarray,     # (N,) predicted object class ids
    obj_scores: np.ndarray,     # (N,)
    rel_pairs: np.ndarray,      # (P, 2) indices into the N objects
    rel_scores: np.ndarray,     # (P, C) predicate softmax INCLUDING bg col 0
    idx_to_label: Dict[str, str],
    idx_to_meta_predicate: Dict[str, str],
    obj_thres: float = 0.1,
) -> Dict:
    """One image's detections → named scene graph
    (generate_detect_sg, preprocessing.py:115-160).

    Reference quirks preserved:
      * the per-pair label is ``argmax`` over ALL columns including
        background — bg-dominated pairs get label 0 and are dropped by the
        final ``rel_matrix > 0`` filter;
      * pairs write into an (N, N) matrix, so duplicate pairs keep only
        the LAST prediction;
      * objects below ``obj_thres`` are removed and relations reindex onto
        the surviving objects.
    """
    obj_labels = np.asarray(obj_labels)
    obj_scores = np.asarray(obj_scores, np.float64).copy()
    rel_pairs = np.asarray(rel_pairs, np.int64).reshape(-1, 2)
    if len(rel_pairs):
        rel_scores = np.asarray(rel_scores, np.float64).reshape(
            len(rel_pairs), -1)
        rel_max = rel_scores.max(-1)
        rel_labels = rel_scores.argmax(-1)
    else:
        rel_max = np.zeros(0)
        rel_labels = np.zeros(0, np.int64)

    obj_scores[obj_scores < obj_thres] = 0.0
    obj_mask = obj_scores >= obj_thres
    triplet = obj_scores[rel_pairs[:, 0]] * obj_scores[rel_pairs[:, 1]] * rel_max
    rel_mask = (rel_labels > 0) | (triplet > 0)

    n = len(obj_labels)
    rel_matrix = np.zeros((n, n), np.int64)
    for k in range(len(rel_pairs)):
        if rel_mask[k]:
            rel_matrix[rel_pairs[k, 0], rel_pairs[k, 1]] = rel_labels[k]
    rel_matrix = rel_matrix[obj_mask][:, obj_mask]
    filter_obj = obj_labels[obj_mask]
    fp = np.argwhere(rel_matrix > 0)
    fr = rel_matrix[fp[:, 0], fp[:, 1]]

    entities = [idx_to_label[str(int(c))] for c in filter_obj]
    relations = [
        [int(i), int(j), idx_to_meta_predicate[str(int(p))]]
        for (i, j), p in zip(fp, fr)
    ]
    return {"entities": entities, "relations": relations}


def generate_detect_sg(
    predictions: Sequence[Dict],
    cap_graph: Dict,
    vg_dict: Dict,
    obj_thres: float = 0.1,
) -> Dict[str, List[Dict]]:
    """All images → {coco_id: [scene graph]} (preprocessing.py:115-160).

    ``predictions`` are per-image dicts with ``image_id`` (VG id),
    ``obj_labels``, ``obj_scores``, ``rel_pairs``, ``rel_scores``.
    """
    valid = valid_vg_ids(cap_graph)
    coco_map = img_coco_mapping(cap_graph)
    out: Dict[str, List[Dict]] = {}
    for pred in predictions:
        vg_id = int(pred["image_id"])
        if vg_id not in valid:
            continue
        sg = detect_sg_from_prediction(
            pred["obj_labels"], pred["obj_scores"], pred["rel_pairs"],
            pred["rel_scores"], vg_dict["idx_to_label"],
            cap_graph["idx_to_meta_predicate"], obj_thres,
        )
        out[str(coco_map[vg_id])] = [sg]
    return out


def generate_gt_sg(cap_graph: Dict, vg_dict: Dict, vg_h5) -> Dict[str, List[Dict]]:
    """Ground-truth variant (generate_gt_sg, preprocessing.py:77-109).

    ``vg_h5`` is the VG-SGG h5 file (or any mapping with the same keys).
    """
    valid = np.asarray(cap_graph["vg_valids"])
    ob_s = np.asarray(vg_h5["img_to_first_box"])
    ob_e = np.asarray(vg_h5["img_to_last_box"])
    rl_s = np.asarray(vg_h5["img_to_first_rel"])
    rl_e = np.asarray(vg_h5["img_to_last_rel"])
    labels = np.asarray(vg_h5["labels"]).reshape(-1)
    pairs = np.asarray(vg_h5["relationships"])
    preds = np.asarray(vg_h5["predicates"]).reshape(-1)

    out: Dict[str, List[Dict]] = {}
    for i in range(len(valid)):
        coco_id = cap_graph["vg_coco_ids"][i]
        if not int(valid[i]) or int(ob_s[i]) < 0 or int(rl_s[i]) < 0:
            continue
        ents = [
            vg_dict["idx_to_label"][str(int(c))]
            for c in labels[int(ob_s[i]): int(ob_e[i]) + 1]
        ]
        gp = pairs[int(rl_s[i]): int(rl_e[i]) + 1] - int(ob_s[i])
        gr = [
            cap_graph["idx_to_meta_predicate"][str(int(p))]
            for p in preds[int(rl_s[i]): int(rl_e[i]) + 1]
        ]
        out[str(coco_id)] = [{
            "entities": ents,
            "relations": [[int(a), int(b), r] for (a, b), r in zip(gp, gr)],
        }]
    return out


def generate_txt_img_sg(
    img_sg: Dict[str, List[Dict]],
    cap_graph: Dict,
    vocabs: Vocabs,
) -> Dict[str, Dict]:
    """Pair and integer-encode image/caption graphs
    (generate_txt_img_sg, preprocessing.py:163-183).

    Entity lists from multiple graphs concatenate; relation endpoints are
    replaced by the ENTITY CLASS IDS (the reference feeds class ids, not
    node indices, into SGEncode).
    """
    txt_sg = cap_graph["vg_coco_id_to_capgraphs"]
    out: Dict[str, Dict] = {}
    for i in range(len(cap_graph["vg_valids"])):
        coco_id = str(cap_graph["vg_coco_ids"][i])
        if not cap_graph["vg_valids"][i]:
            continue
        if coco_id not in img_sg or coco_id not in txt_sg:
            continue

        def encode(graphs, obj2id, rel2id):
            enc = {"entities": [], "relations": []}
            for item in graphs:
                ents = [obj2id[e] for e in item["entities"]]
                rels = [
                    [ents[r[0]], ents[r[1]], rel2id[r[2]]]
                    for r in item["relations"]
                ]
                enc["entities"] += ents
                enc["relations"] += rels
            return enc

        out[coco_id] = {
            "img": encode(img_sg[coco_id], vocabs.sgg_obj2id, vocabs.sgg_rel2id),
            "txt": encode(txt_sg[coco_id], vocabs.txt_obj2id, vocabs.txt_rel2id),
        }
    return out


def split_keys(
    keys: Sequence[str],
    test_ids: Sequence[str],
    split: str = "train",
    num_test: int = 5000,
    num_val: int = 1000,
) -> List[str]:
    """SGEncoding's key selection (dataloader.py:41-50): the first
    ``num_test`` test ids are the test set, the next ``num_val`` the val
    set, and everything else (test remainder + train ids) trains."""
    keys = sorted(keys)
    test_ids = [k for k in test_ids if k in set(keys)]
    train_ids = [k for k in keys if k not in set(test_ids)]
    if split == "test":
        return list(test_ids[:num_test])
    if split == "val":
        return list(test_ids[num_test: num_test + num_val])
    return list(test_ids[num_test + num_val:]) + list(train_ids)


def pairs_records(txt_img_sg: Dict[str, Dict], keys=None) -> List[Dict]:
    """Flatten to the training tool's record list (sorted by coco id)."""
    if keys is None:
        keys = sorted(txt_img_sg)
    return [txt_img_sg[k] for k in keys]
