"""Regenerate tests/fixtures/sgg_eval_{inputs.npz,golden.json}.

Golden metric values come from the REFERENCE implementation
(/root/reference/pysgg/.../sgg_eval.py) loaded standalone with its package
imports stubbed (it needs yacs/sklearn/_C otherwise).  Our SGGEvaluator must
reproduce these numbers bit-for-bit — this is the parity anchor from
SURVEY.md §7 step 4.

Run: python tools/gen_eval_fixtures.py  (requires /root/reference mounted)
"""

import importlib.util
import json
import sys
import types

import numpy as np

REF = "/root/reference/pysgg/data/datasets/evaluation/vg/sgg_eval.py"
NUM_REL = 8
KS = (20, 50, 100)


def load_reference_sgg_eval():
    def intersect_2d(x1, x2):
        return (x1[..., None] == x2.T[None, ...]).all(1)

    def argsort_desc(scores):
        return np.column_stack(
            np.unravel_index(np.argsort(-scores.ravel()), scores.shape)
        )

    def bbox_overlaps(b1, b2):
        b1 = np.asarray(b1, np.float64)
        b2 = np.asarray(b2, np.float64)
        a1 = (b1[:, 2] - b1[:, 0] + 1) * (b1[:, 3] - b1[:, 1] + 1)
        a2 = (b2[:, 2] - b2[:, 0] + 1) * (b2[:, 3] - b2[:, 1] + 1)
        lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
        rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
        wh = np.clip(rb - lt + 1, 0, None)
        inter = wh[..., 0] * wh[..., 1]
        return inter / (a1[:, None] + a2[None, :] - inter)

    cfgmod = types.ModuleType("pysgg.config")

    class _D(dict):
        def __getattr__(self, k):
            return self.setdefault(k, _D())

    cfgmod.cfg = _D()
    misc = types.ModuleType("pysgg.utils.miscellaneous")
    misc.intersect_2d, misc.argsort_desc, misc.bbox_overlaps = (
        intersect_2d,
        argsort_desc,
        bbox_overlaps,
    )
    stage = types.ModuleType("x")
    for n in (
        "boxlist_iou",
        "intersect_2d_torch_tensor",
        "dump_hit_indx_dict_to_tensor",
        "trans_cluster_label",
        "ENTITY_CLUSTER",
        "PREDICATE_CLUSTER",
    ):
        setattr(stage, n, None)
    sk = types.ModuleType("sklearn")
    sk.metrics = types.ModuleType("sklearn.metrics")
    sys.modules.update(
        {
            "pysgg": types.ModuleType("pysgg"),
            "pysgg.config": cfgmod,
            "pysgg.utils": types.ModuleType("pysgg.utils"),
            "pysgg.utils.miscellaneous": misc,
            "pysgg.data": types.ModuleType("x"),
            "pysgg.data.datasets": types.ModuleType("x"),
            "pysgg.data.datasets.evaluation": types.ModuleType("x"),
            "pysgg.data.datasets.evaluation.vg": types.ModuleType("x"),
            "pysgg.data.datasets.evaluation.vg.vg_stage_eval_utils": stage,
            "sklearn": sk,
            "sklearn.metrics": sk.metrics,
        }
    )
    spec = importlib.util.spec_from_file_location("ref_sgg_eval", REF)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    return ref


def fake_image(rng, n_obj, n_gt_rel, n_pred_rel):
    gt_boxes = np.sort(rng.uniform(0, 80, (n_obj, 4)), axis=-1).astype(np.float32)
    gt_boxes[:, 2:] += 20
    gt_classes = rng.randint(1, 10, n_obj)
    pairs = [(i, j) for i in range(n_obj) for j in range(n_obj) if i != j]
    sel = rng.choice(len(pairs), n_gt_rel, replace=False)
    gt_rels = np.array(
        [[pairs[s][0], pairs[s][1], rng.randint(1, NUM_REL)] for s in sel]
    )
    # heavy jitter + 40% label flips so predcls/sgcls/sgdet goldens diverge
    pred_boxes = gt_boxes + rng.uniform(-10, 10, gt_boxes.shape).astype(np.float32)
    pred_classes = gt_classes.copy()
    flip = rng.rand(n_obj) < 0.4
    pred_classes[flip] = rng.randint(1, 10, int(flip.sum()))
    obj_scores = rng.uniform(0.3, 1.0, n_obj)
    psel = rng.choice(len(pairs), n_pred_rel, replace=False)
    pred_rel_inds = np.array([pairs[s] for s in psel])
    rel_scores = rng.dirichlet(np.ones(NUM_REL), n_pred_rel).astype(np.float64)
    # make the first GT relation strongly predicted so zR/A fire:
    # force one prediction onto that pair with the right predicate argmax
    pred_rel_inds[0] = gt_rels[0, :2]
    rel_scores[0] = 0.02
    rel_scores[0, gt_rels[0, 2]] = 0.9
    return dict(
        gt_boxes=gt_boxes,
        gt_classes=gt_classes,
        gt_rels=gt_rels,
        pred_boxes=pred_boxes,
        pred_classes=pred_classes,
        obj_scores=obj_scores,
        pred_rel_inds=pred_rel_inds,
        rel_scores=rel_scores,
    )


def main():
    ref = load_reference_sgg_eval()
    rng = np.random.RandomState(42)
    images = [
        fake_image(rng, 6, 5, 20),
        fake_image(rng, 8, 7, 30),
        fake_image(rng, 5, 3, 12),
    ]
    # zero-shot list: image-0's first GT triplet (which we made predictable)
    # in (s_class, o_class, predicate) order (sgg_eval.py:283-289) + a dud
    im0 = images[0]
    zeroshot = np.array(
        [
            [
                im0["gt_classes"][im0["gt_rels"][0, 0]],
                im0["gt_classes"][im0["gt_rels"][0, 1]],
                im0["gt_rels"][0, 2],
            ],
            [3, 4, 2],
        ]
    )

    fix = {"zeroshot": zeroshot, "n_images": np.array(len(images))}
    for i, im in enumerate(images):
        for k, v in im.items():
            fix[f"im{i}_{k}"] = v
    np.savez("tests/fixtures/sgg_eval_inputs.npz", **fix)

    goldens = {}
    names = ["bg"] + [f"p{i}" for i in range(1, NUM_REL)]
    for mode in ("sgcls", "predcls", "sgdet"):
        rd, e = {}, {}
        e["r"] = ref.SGRecall(rd)
        e["r"].register_container(mode)
        e["ng"] = ref.SGNoGraphConstraintRecall(rd)
        e["ng"].register_container(mode)
        e["zs"] = ref.SGZeroShotRecall(rd)
        e["zs"].register_container(mode)
        e["pa"] = ref.SGPairAccuracy(rd)
        e["pa"].register_container(mode)
        e["mr"] = ref.SGMeanRecall(rd, NUM_REL, names)
        e["mr"].register_container(mode)
        e["ngmr"] = ref.SGNGMeanRecall(rd, NUM_REL, names)
        e["ngmr"].register_container(mode)
        gc = {"mode": mode, "iou_thres": 0.5, "zeroshot_triplet": zeroshot}
        for im in images:
            lc = dict(im)
            if mode == "predcls":
                lc["pred_boxes"] = lc["gt_boxes"]
                lc["pred_classes"] = lc["gt_classes"]
                lc["obj_scores"] = np.ones(lc["gt_classes"].shape[0])
            if mode != "sgdet":
                e["pa"].prepare_gtpair(lc)
            e["zs"].prepare_zeroshot(gc, lc)
            lc = e["r"].calculate_recall(gc, lc, mode)
            e["ng"].calculate_recall(gc, lc, mode)
            if mode != "sgdet":
                e["pa"].calculate_recall(gc, lc, mode)
            e["mr"].collect_mean_recall_items(gc, lc, mode)
            e["ngmr"].collect_mean_recall_items(gc, lc, mode)
            e["zs"].calculate_recall(gc, lc, mode)
        e["mr"].calculate_mean_recall(mode)
        e["ngmr"].calculate_mean_recall(mode)
        goldens[mode] = {
            "R": {k: float(np.mean(v)) for k, v in rd[mode + "_recall"].items()},
            "ngR": {
                k: float(np.mean(v)) for k, v in rd[mode + "_recall_nogc"].items()
            },
            "zR": {
                k: float(np.mean(v)) if v else 0.0
                for k, v in rd[mode + "_zeroshot_recall"].items()
            },
            "mR": {k: float(v) for k, v in rd[mode + "_mean_recall"].items()},
            "ngmR": {k: float(v) for k, v in rd[mode + "_ng_mean_recall"].items()},
        }
        if mode != "sgdet":
            goldens[mode]["A"] = {
                k: float(
                    np.mean(rd[mode + "_accuracy_hit"][k])
                    / np.mean(rd[mode + "_accuracy_count"][k])
                )
                for k in KS
            }
    json.dump(goldens, open("tests/fixtures/sgg_eval_golden.json", "w"), indent=1)
    print(json.dumps({m: g["R"] for m, g in goldens.items()}, indent=1))
    print("zR predcls:", goldens["predcls"]["zR"])


if __name__ == "__main__":
    main()
