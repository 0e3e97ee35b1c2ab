"""One-command real-data parity harness vs the live reference (VERDICT r4 #4).

Runs the reference's ACTUAL `GeneralizedRCNN` (torch, its own CPU kernels)
and the rebuild (weights imported through utils/torch_import.py)
side-by-side on the same images, diffs the final prediction fields per
image, scores both stacks with the shared SGG metric kernel, and writes a
JSON report.

    # offline smoke (synthetic stand-ins — runs end-to-end today):
    python tools/parity_vs_reference.py --mode predcls --out /tmp/report.json

    # real data (drop the files, run — zero code changes):
    python tools/parity_vs_reference.py --mode sgdet \
        --ref-ckpt /path/model_final.pth \
        --images /path/VG_100K --depth-images /path/VG_depth \
        --vg-h5 /path/VG-SGG-with-attri.h5 --dict-json /path/VG-SGG-dicts-with-attri.json \
        --image-data /path/image_data.json --num-images 100 --out report.json

Artifacts needed for the real-VG run (reference README "Pretrained
Models" + DATASET.md):
  * ``model_final.pth``          — a reference training checkpoint (the
    relation model; for detector-only parity a Scene-Graph-Benchmark
    detector checkpoint also works — unmatched relation weights stay at
    the seeded init on BOTH sides).
  * ``VG_100K/``                 — the VG images ({image_id}.jpg).
  * ``VG_depth/``                — depth maps ({image_id}-depth_raw.png).
  * ``VG-SGG-with-attri.h5``     — boxes/labels/relations (BOX_SCALE 1024).
  * ``VG-SGG-dicts-with-attri.json`` + ``image_data.json``.

Pipeline: images are preprocessed ONCE on the host (the parity-tested
resize/normalize path, veto_tpu/data/transforms.py) and the identical
tensors feed both stacks, so any disagreement is model wiring — not IO.
Phase A (reference) runs in a subprocess via tests/ref_full_model.py
(the real pysgg package import needs a clean interpreter).
"""

import argparse
import json
import os
import pickle
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

NUM_OBJ, NUM_REL = 151, 51


# ---------------------------------------------------------------------------
# image preparation (shared tensors for both stacks)
# ---------------------------------------------------------------------------
def _prep_one(image_u8, depth_raw, boxes, labels, min_size=480, max_size=800,
              div=32):
    """resize → normalize → pad-to-/32; returns CHW tensors + scaled GT.

    Smaller-than-flagship sizes by default keep the CPU reference pass
    tractable; pass --min-size 800 --max-size 1333 for the shipped scale.
    """
    from veto_tpu.data.transforms import (
        normalize_depth,
        normalize_image,
        resize_image,
        resize_shape,
    )

    h0, w0 = image_u8.shape[:2]
    oh, ow = resize_shape(w0, h0, min_size, max_size)
    img = resize_image(np.asarray(image_u8, np.float32) / 255.0, oh, ow)
    img = normalize_image(img)
    if depth_raw is None:
        dep = np.zeros((oh, ow, 1), np.float32)
    else:
        dep = normalize_depth(resize_image(depth_raw, oh, ow))
    ph = (oh + div - 1) // div * div
    pw = (ow + div - 1) // div * div
    pimg = np.zeros((ph, pw, 3), np.float32)
    pimg[:oh, :ow] = img
    pdep = np.zeros((ph, pw, 1), np.float32)
    pdep[:oh, :ow] = dep
    sy, sx = oh / h0, ow / w0
    sboxes = np.asarray(boxes, np.float32) * [sx, sy, sx, sy]
    return dict(
        image=np.ascontiguousarray(pimg.transpose(2, 0, 1)),
        depth=np.ascontiguousarray(pdep.transpose(2, 0, 1)),
        boxes=sboxes.astype(np.float32),
        labels=np.asarray(labels, np.int64),
        size=(ow, oh), padded=(pw, ph),
    )


def synthetic_items(n, seed=5, width=480, height=320, n_boxes=6):
    rng = np.random.RandomState(seed)
    items = []
    for _ in range(n):
        img = rng.randint(0, 255, (height, width, 3)).astype(np.uint8)
        dep = rng.randn(height, width, 1).astype(np.float32)
        boxes = np.zeros((n_boxes, 4), np.float32)
        boxes[:, 0] = rng.uniform(0, width * 0.6, n_boxes)
        boxes[:, 1] = rng.uniform(0, height * 0.6, n_boxes)
        boxes[:, 2] = boxes[:, 0] + rng.uniform(24, width * 0.35, n_boxes)
        boxes[:, 3] = boxes[:, 1] + rng.uniform(24, height * 0.35, n_boxes)
        boxes[:, 2:] = np.minimum(boxes[:, 2:], [width - 1, height - 1])
        labels = rng.randint(1, NUM_OBJ, n_boxes)
        pairs = [(i, j) for i in range(n_boxes) for j in range(n_boxes)
                 if i != j]
        sel = rng.choice(len(pairs), 4, replace=False)
        rels = np.array([[pairs[s][0], pairs[s][1], rng.randint(1, NUM_REL)]
                         for s in sel], np.int64)
        items.append((img, dep, boxes, labels, rels))
    return items


def vg_items(args):
    """Real VG: reader → (u8 image, depth, GT boxes/labels/rels)."""
    from veto_tpu.data.visual_genome import VGDataset

    ds = VGDataset(
        split="test", img_dir=args.images, depth_img_dir=args.depth_images,
        roidb_file=args.vg_h5, dict_file=args.dict_json,
        image_file=args.image_data, num_val_im=5000, filter_empty_rels=True,
        filter_duplicate_rels=False,
    )
    items = []
    for i in range(min(args.num_images, len(ds))):
        inner = ds.idx_list[i]
        rec = ds.get_groundtruth(i, inner_idx=False)
        img = (ds.load_image(inner) * 255).astype(np.uint8)
        dep = ds.load_depth(inner)
        items.append((img, dep, rec["boxes"], rec["labels"],
                      rec["rel_tuples"]))
    return items


# ---------------------------------------------------------------------------
def run_reference_phase(mode, prepared, ckpt, workdir):
    in_pkl = os.path.join(workdir, "parity_images.pkl")
    out_pkl = os.path.join(workdir, "parity_ref.pkl")
    with open(in_pkl, "wb") as fh:
        pickle.dump(prepared, fh)
    cmd = [sys.executable, os.path.join(REPO, "tests", "ref_full_model.py"),
           "--mode", mode, "--from-batch", in_pkl, "--out", out_pkl]
    if ckpt:
        cmd += ["--ckpt", ckpt]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    subprocess.run(cmd, check=True, env=env, cwd=REPO)
    with open(out_pkl, "rb") as fh:
        return pickle.load(fh)


def run_rebuild_phase(mode, prepared, state_dict, later_nms=0.5):
    import jax
    import jax.numpy as jnp

    from test_whole_model_parity import (
        _State,
        _flagship_model,
        _import_all_weights,
        _init_variables,
        _make_batch,
    )
    from veto_tpu.engine.train import make_eval_step, make_sgdet_eval_step

    model = _flagship_model(mode)
    outs = []
    step_cache = {}
    for item in prepared:
        raw = dict(
            image=item["image"][None], depth=item["depth"][None],
            boxes=item["boxes"], labels=item["labels"],
            width=item["size"][0], height=item["size"][1],
        )
        batch = _make_batch(raw, num_obj=NUM_OBJ)
        shape = batch.images.shape
        if shape not in step_cache:
            variables = _init_variables(model, batch)
            variables = _import_all_weights(variables, state_dict)
            n = item["boxes"].shape[0]
            if mode == "sgdet":
                step = make_sgdet_eval_step(
                    model, max_pairs=2048, later_nms_thres=later_nms)
            else:
                step = make_eval_step(model, max_pairs=max(n * (n - 1), 2))
            step_cache[shape] = (variables, step)
        variables, step = step_cache[shape]
        pred = jax.tree.map(np.asarray, step(_State(variables), batch))
        outs.append(jax.tree.map(lambda x: x[0], pred))
    return outs


def diff_fields(mode, ref_fields, pred):
    """Per-image field diffs (None-safe numeric summary)."""
    d = {}
    pairs_ref = ref_fields["rel_pair_idxs"]
    n = len(pairs_ref)
    d["n_rels_ref"] = int(n)
    d["pair_order_match"] = float(
        np.mean(np.all(pred.pair_idx[:n] == pairs_ref, axis=1)))
    rs = ref_fields["pred_rel_scores"]
    d["rel_scores_maxdiff"] = float(
        np.abs(pred.rel_scores[:n] - rs).max()) if n else 0.0
    d["rel_labels_match"] = float(
        np.mean(pred.rel_labels[:n] == ref_fields["pred_rel_labels"]))
    d["obj_labels_match"] = float(
        np.mean(pred.obj_labels[: len(ref_fields["pred_labels"])]
                == ref_fields["pred_labels"]))
    d["obj_scores_maxdiff"] = float(
        np.abs(pred.obj_scores[: len(ref_fields["pred_scores"])]
               - ref_fields["pred_scores"]).max())
    if mode == "sgdet" and hasattr(pred, "boxes"):
        d["boxes_maxdiff"] = float(
            np.abs(pred.boxes[: len(ref_fields["boxes"])]
                   - ref_fields["boxes"]).max())
    return d


def evaluate_stack(mode, items, per_image_fields=None, preds=None):
    """R@K/mR@K through the shared golden-tested metric kernel."""
    from veto_tpu.evaluation.sgg_eval import SGGEvaluator

    ev = SGGEvaluator(mode=mode, num_rel_classes=NUM_REL)
    for i, (_, _, boxes, labels, rels) in enumerate(items):
        if per_image_fields is not None:
            f = per_image_fields[i]
            ev.add_image(boxes, labels, rels, f["boxes"], f["pred_labels"],
                         f["pred_scores"], f["rel_pair_idxs"],
                         f["pred_rel_scores"])
        else:
            p = preds[i]
            pm = p.pair_mask
            pb = p.boxes if hasattr(p, "boxes") else boxes
            nb = len(boxes) if mode != "sgdet" else len(p.obj_labels)
            ev.add_image(boxes, labels, rels, pb[:nb], p.obj_labels[:nb],
                         p.obj_scores[:nb], p.pair_idx[pm],
                         p.rel_scores[pm])
    agg = ev.aggregate()
    return {m: {int(k): float(v) for k, v in agg[m].items()}
            for m in ("R", "mR", "ngR")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="predcls", choices=["predcls", "sgdet"])
    ap.add_argument("--ref-ckpt", default="")
    ap.add_argument("--images", default="", help="VG_100K dir (real run)")
    ap.add_argument("--depth-images", default="")
    ap.add_argument("--vg-h5", default="")
    ap.add_argument("--dict-json", default="")
    ap.add_argument("--image-data", default="")
    ap.add_argument("--num-images", type=int, default=2)
    ap.add_argument("--min-size", type=int, default=480)
    ap.add_argument("--max-size", type=int, default=800)
    ap.add_argument("--out", default="/tmp/parity_report.json")
    ap.add_argument("--workdir", default="/tmp/veto_parity")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    real = bool(args.images and args.vg_h5)
    items = vg_items(args) if real else synthetic_items(args.num_images)
    # one spatial bucket keeps compile count low; box scaling is per-image
    prepared = [
        _prep_one(img, dep, boxes, labels, args.min_size, args.max_size)
        for img, dep, boxes, labels, _ in items
    ]

    print(f"phase A: reference over {len(prepared)} images "
          f"({'real VG' if real else 'synthetic stand-ins'})", flush=True)
    ref = run_reference_phase(args.mode, prepared, args.ref_ckpt,
                              args.workdir)

    print("phase B: rebuild with imported weights", flush=True)
    preds = run_rebuild_phase(args.mode, prepared, ref["state_dict"])

    report = {
        "mode": args.mode, "images": len(prepared), "real_data": real,
        "ref_ckpt": args.ref_ckpt or "(seeded random init)",
        "per_image": [
            diff_fields(args.mode, ref["per_image"][i], preds[i])
            for i in range(len(preds))
        ],
        "metrics_reference": evaluate_stack(
            args.mode, items, per_image_fields=ref["per_image"]),
        "metrics_rebuild": evaluate_stack(args.mode, items, preds=preds),
    }
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({k: report[k] for k in
                      ("metrics_reference", "metrics_rebuild")}, indent=1))
    print(f"report → {args.out}")


if __name__ == "__main__":
    main()
