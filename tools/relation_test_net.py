"""Relation evaluation entry point (reference tools/relation_test_net.py:27-119).

Loads the latest checkpoint from ``output_dir`` and evaluates the test
split, printing the full R@K / mR@K / ngR@K / zR@K / A@K report and writing
``eval_results.json`` (the reference's result_dict.pytorch analog).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def _retrieval_entries(kind, preds_out, recs):
    """Per-image prediction dicts for the retrieval preprocessing
    (the reference's eval_results.pytorch fields, preprocessing.py:128-135:
    pred_labels / pred_scores / rel_pair_idxs / pred_rel_scores)."""
    import numpy as np

    if kind == "meet":
        preds, _boxes, det_mask = preds_out
    else:
        preds = preds_out
        det_mask = getattr(preds, "det_mask", None)
    for i, rec in enumerate(recs):
        pm = np.asarray(preds.pair_mask[i])
        if det_mask is not None:
            dm = np.asarray(det_mask[i])
            if dm.sum() == 0 or pm.sum() == 0:
                continue
            remap = np.cumsum(dm) - 1
            labels = np.asarray(preds.obj_labels[i])[dm]
            scores = np.asarray(preds.obj_scores[i])[dm]
            pairs = remap[np.asarray(preds.pair_idx[i])[pm]]
        else:
            n = len(rec["boxes"])
            labels = np.asarray(preds.obj_labels[i])[:n]
            scores = np.asarray(preds.obj_scores[i])[:n]
            pairs = np.asarray(preds.pair_idx[i])[pm]
        yield {
            "image_id": int(rec.get("image_id", -1)),
            "obj_labels": labels.tolist(),
            "obj_scores": scores.tolist(),
            "rel_pairs": pairs.tolist(),
            "rel_scores": np.asarray(preds.rel_scores[i])[pm].tolist(),
        }


def main():
    parser = argparse.ArgumentParser(description="VETO-TPU relation evaluation")
    parser.add_argument("--config", default=None)
    parser.add_argument("--split", default="test", choices=["val", "test"])
    parser.add_argument(
        "--save-retrieval-predictions", action="store_true",
        help="dump per-image predictions (retrieval_predictions.jsonl) for "
             "the image-retrieval preprocessing "
             "(veto_tpu/retrieval/preprocessing.py; reference "
             "eval_results.pytorch analog)")
    parser.add_argument("--debug-nans", action="store_true",
                        help="enable jax_debug_nans (raise at the first NaN-producing op)")
    parser.add_argument("opts", nargs="*", default=[])
    args = parser.parse_args()
    if args.debug_nans:
        # re-run any op that produced a NaN eagerly and raise at the exact
        # primitive (SURVEY §5 debug toggle; jax.config jax_debug_nans)
        jax.config.update("jax_debug_nans", True)

    import numpy as np
    from relation_train_net import (
        FROZEN_DETECTOR,
        accumulate_eval,
        batches_for,
        build_dataset,
        build_model,
        init_model,
        make_eval_fn,
        make_sgg_evaluator,
    )

    from veto_tpu.config import load_config
    from veto_tpu.engine.train import create_train_state
    from veto_tpu.solver.optim import make_optimizer
    from veto_tpu.utils.checkpoint import CheckpointManager
    from veto_tpu.utils.logger import setup_logger

    cfg = load_config(args.config, args.opts)
    logger = setup_logger("veto_tpu.test", cfg.output_dir)
    model = build_model(cfg)
    ds = build_dataset(cfg, args.split)
    gen = batches_for(cfg, ds, args.split)

    rng = jax.random.PRNGKey(cfg.solver.seed)
    batch, _ = next(gen(max_iter=1))
    small = jax.tree.map(lambda x: jnp.asarray(x[:1]), batch)
    variables = init_model(cfg, model, rng, small)
    tx = make_optimizer(cfg.solver, variables["params"],
                        frozen_prefixes=FROZEN_DETECTOR)
    state = create_train_state(model, tx, rng, small, variables=variables)
    ckpt = CheckpointManager(os.path.join(cfg.output_dir, "ckpt"))
    state, _ = ckpt.restore(state)
    logger.info(f"evaluating checkpoint @ step {int(state.step)}")

    # same {data, pair} mesh the train tool's validation path uses
    # (relation_train_net.py), so pair-axis sharding engages on multi-chip
    # hosts in the standalone test tool too
    import math

    from veto_tpu.engine.train import make_mesh

    ndev = len(jax.devices())
    data_axis = math.gcd(ndev, cfg.test.ims_per_batch)
    mesh = make_mesh(data=data_axis, pair=ndev // data_axis)
    step, kind = make_eval_fn(cfg, model, mesh=mesh)
    # zR needs the training split's triplet set (reference vg_eval always
    # evaluates zero-shot recall); derive it unless disabled
    train_ds = build_dataset(cfg, "train") if cfg.test.zeroshot_eval else None
    evaluator = make_sgg_evaluator(cfg, train_ds, ds)
    coco = None
    if cfg.relation.mode == "sgdet":
        from veto_tpu.evaluation.coco_map import CocoMapEvaluator

        coco = CocoMapEvaluator(num_classes=cfg.model.num_obj_classes)
    oi = None
    if "OI" in cfg.data.dataset.upper() or "OPEN" in cfg.data.dataset.upper():
        # Open Images adds weighted-mAP relation/phrase metrics
        # (reference oi/oi_evaluation.py)
        from veto_tpu.evaluation.oi_eval import OIEvaluator

        oi = OIEvaluator(num_rel_classes=cfg.relation.num_classes)
    visual_info = [] if cfg.test.save_visual_info else None
    retr_file = None
    if args.save_retrieval_predictions:
        retr_path = os.path.join(cfg.output_dir, "retrieval_predictions.jsonl")
        retr_file = open(retr_path, "w")
    for batch, recs in gen(max_iter=0):
        batch = jax.tree.map(jnp.asarray, batch)
        preds = jax.device_get(step(state, batch))
        accumulate_eval(kind, preds, recs, evaluator,
                        input_sizes=np.asarray(batch.sizes),
                        coco_evaluator=coco, oi_evaluator=oi)
        if retr_file is not None:
            for entry in _retrieval_entries(kind, preds, recs):
                retr_file.write(json.dumps(entry) + "\n")
        if visual_info is not None:
            for i, rec in enumerate(recs):
                pm = np.asarray(preds.pair_mask[i])
                n = len(rec["boxes"])
                visual_info.append({
                    "image_id": int(rec.get("image_id", len(visual_info))),
                    "boxes": np.asarray(rec["boxes"]).tolist(),
                    "labels": np.asarray(rec["labels"]).tolist(),
                    "pred_labels": np.asarray(preds.obj_labels[i][:n]).tolist(),
                    "rel_pairs": np.asarray(preds.pair_idx[i][pm]).tolist(),
                    "rel_labels": np.asarray(
                        1 + preds.rel_scores[i][pm][:, 1:].argmax(-1)
                    ).tolist(),
                })
    if retr_file is not None:
        retr_file.close()
        logger.info(f"wrote {retr_path}")
    if cfg.test.sync_gather:
        from veto_tpu.engine.gather import sync_gather_evaluator

        sync_gather_evaluator(evaluator)  # no-op on a single host
    if coco is not None:
        det = coco.aggregate()
        logger.info(
            f"detection mAP {det['mAP']:.4f}  AP50 {det['AP50']:.4f}  "
            f"AP75 {det['AP75']:.4f}"
        )
    if oi is not None:
        oi_agg = oi.aggregate()
        logger.info(
            "OI: " + "  ".join(f"{k} {v:.4f}" for k, v in oi_agg.items())
        )
    summary = evaluator.summary_string()
    logger.info("\n" + summary)
    # human-readable result file (reference vg_eval.py:425-426)
    with open(os.path.join(cfg.output_dir, "evaluation_res.txt"), "w") as f:
        f.write(summary + "\n")
    agg = evaluator.aggregate()
    if cfg.test.save_plots and evaluator.longtail_parts is not None:
        from veto_tpu.data.predicate_stats import predicate_counts
        from veto_tpu.utils.viz import eval_plots_from_aggregate

        names = getattr(ds, "ind_to_predicates",
                        [str(i) for i in range(cfg.relation.num_classes)])
        counts = predicate_counts(
            "GQA" if "GQA" in cfg.data.dataset else "VG"
        )[: cfg.relation.num_classes]
        p = eval_plots_from_aggregate(
            agg, names, counts, evaluator.longtail_parts,
            cfg.output_dir, cfg.relation.mode, 1)
        if p:
            logger.info(f"wrote {p}")
    out = {
        metric: {str(k): v for k, v in vals.items()}
        for metric, vals in agg.items()
        if metric != "mR_per_class"
    }
    with open(os.path.join(cfg.output_dir, "eval_results.json"), "w") as f:
        json.dump(out, f, indent=2)
    if visual_info is not None:
        with open(os.path.join(cfg.output_dir, "visual_info.json"), "w") as f:
            json.dump(visual_info, f)
        logger.info(f"wrote {cfg.output_dir}/visual_info.json")
    logger.info(f"wrote {cfg.output_dir}/eval_results.json")


if __name__ == "__main__":
    main()
