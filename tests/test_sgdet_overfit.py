"""sgdet convergence: the FULL cascade must learn on a synthetic corpus.

VERDICT r3 #2: test_overfit.py proves predcls learns; nothing proved the
deepest path (RPN → box head → detect_relsample → relation loss,
reference sampling.py:109-309 + box_head.py:94-103) actually LEARNS — a
label-assignment or detect_relsample wiring bug that merely slows learning
would pass the step-smoke tests.

Two stages on a tiny model + 8 rendered-rectangle images (class-colored
boxes, deterministic class-pair → predicate mapping):

1. detector pretraining (make_detector_train_step, everything trainable):
   class-aware detection recall must go far above chance;
2. sgdet relation training (detector frozen, detect_relsample supervision):
   train-split sgdet R@20 must go far above chance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from veto_tpu.config.defaults import SolverConfig
from veto_tpu.data.synthetic import SyntheticSGGDataset
from veto_tpu.engine.pretrain import make_detector_train_step
from veto_tpu.engine.train import (
    TrainState,
    make_sgdet_eval_step,
    make_sgdet_train_step,
)
from veto_tpu.evaluation.sgg_eval import SGGEvaluator
from veto_tpu.models.sgg import SGGModel
from veto_tpu.solver.optim import make_optimizer

NUM_OBJ, NUM_REL = 7, 6
MAX_BOXES = 6
IMG = (64, 64)
DETS = 8
DET_STEPS = 300
REL_STEPS = 300


def _iou_matrix(a, b):
    ax1, ay1, ax2, ay2 = a[:, 0, None], a[:, 1, None], a[:, 2, None], a[:, 3, None]
    bx1, by1, bx2, by2 = b[None, :, 0], b[None, :, 1], b[None, :, 2], b[None, :, 3]
    iw = np.clip(np.minimum(ax2, bx2) - np.maximum(ax1, bx1) + 1, 0, None)
    ih = np.clip(np.minimum(ay2, by2) - np.maximum(ay1, by1) + 1, 0, None)
    inter = iw * ih
    area_a = (ax2 - ax1 + 1) * (ay2 - ay1 + 1)
    area_b = (bx2 - bx1 + 1) * (by2 - by1 + 1)
    return inter / np.maximum(area_a + area_b - inter, 1e-9)


@pytest.mark.slow
def test_sgdet_overfits_synthetic_corpus():
    model = SGGModel(
        num_obj_classes=NUM_OBJ, num_rel_classes=NUM_REL, mode="sgdet",
        stage_blocks=(1, 1, 1, 1), groups=1, width_per_group=16,
        fpn_channels=32, veto_dim=96, veto_layers=2, veto_heads=6,
        veto_depth_proj_dim=64, veto_visual_proj_dim=32, embed_dim=32,
        # objects are 6-19 px on a 64x64 canvas: shrink the anchor pyramid
        # so P2/P3 anchors actually overlap GT at IoU>=0.7
        anchor_sizes=(8, 16, 32, 64, 128),
        aspect_ratios=(0.5, 1.0, 2.0),
        rpn_pre_nms_top_n=256, rpn_post_nms_top_n=32,
        rpn_fpn_post_nms_top_n=48, detections_per_img=DETS,
        box_mlp_dim=64, box_score_thresh=0.05,
        dtype=jnp.float32,
    )
    ds = SyntheticSGGDataset(
        num_images=8, image_size=IMG, num_obj_classes=NUM_OBJ,
        num_rel_classes=NUM_REL, max_objects=4, min_objects=3,
        max_relations=4, seed=7, render_boxes=True, deterministic_rels=True,
    )
    batch, recs = next(ds.batches(batch_size=8, max_boxes=MAX_BOXES))
    batch = jax.tree.map(jnp.asarray, batch)

    rng = jax.random.PRNGKey(0)
    small = jax.tree.map(lambda x: x[:1], batch)
    pi = jnp.zeros((1, 4, 2), jnp.int32)
    variables = model.init(
        rng, small.images, small.depth, small.boxes, small.box_mask,
        small.labels, small.obj_logits, pi, jnp.ones((1, 4), bool),
        method="init_all",
    )

    # ---- stage 1: detector pretraining (relation head frozen) ----
    det_cfg = SolverConfig(base_lr=2e-3, ims_per_batch=8,
                           scale_lr_by_batch=False, warmup_iters=0,
                           grad_clip_norm=5.0)
    det_tx = make_optimizer(det_cfg, variables["params"],
                            frozen_prefixes=("relation", "depth_backbone"))
    state = TrainState(
        step=jnp.asarray(0, jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=det_tx.init(variables["params"]), rng=rng,
    )
    det_step = jax.jit(
        make_detector_train_step(
            model, det_tx, rpn_batch_size=64, box_batch_size=64,
            rpn_pre_nms_top_n=256, rpn_post_nms_top_n=32,
            rpn_fpn_post_nms_top_n=48,
        ),
        donate_argnums=(0,),
    )
    one = jnp.asarray(1.0, jnp.float32)
    for _ in range(DET_STEPS):
        state, det_metrics = det_step(state, batch, one)
    assert np.isfinite(float(det_metrics["loss"]))

    # class-aware detection recall on the train split: a GT object counts as
    # found when some detection overlaps it at IoU>=0.5 with the right label
    det = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch.images, batch.sizes.astype(jnp.float32), method="detect",
    )
    dets = jax.device_get(det.detections)
    found = total = 0
    for i, rec in enumerate(recs):
        m = dets.mask[i]
        total += len(rec["boxes"])
        if m.sum() == 0:
            continue
        iou = _iou_matrix(rec["boxes"], dets.boxes[i][m])
        cls_ok = rec["labels"][:, None] == dets.labels[i][m][None, :]
        found += int(((iou >= 0.5) & cls_ok).any(axis=1).sum())
    det_recall = found / max(total, 1)
    # chance for the class-aware match is ~1/(NUM_OBJ-1) per localized box
    assert det_recall >= 0.7, f"detector failed to learn: recall {det_recall}"

    # ---- stage 2: relation training on frozen detections ----
    rel_cfg = SolverConfig(base_lr=1e-3, ims_per_batch=8,
                           scale_lr_by_batch=False, warmup_iters=0,
                           grad_clip_norm=5.0)
    rel_tx = make_optimizer(
        rel_cfg, state.params,
        frozen_prefixes=("backbone", "rpn", "box_extractor", "box_predictor"),
    )
    state = TrainState(
        step=jnp.asarray(0, jnp.int32), params=state.params,
        batch_stats=state.batch_stats,
        opt_state=rel_tx.init(state.params), rng=jax.random.PRNGKey(1),
    )
    rel_step = jax.jit(
        make_sgdet_train_step(model, rel_tx, None, batch_size_per_image=32,
                              positive_fraction=0.5),
        donate_argnums=(0,),
    )
    first_loss = last_loss = None
    for _ in range(REL_STEPS):
        state, metrics = rel_step(state, batch, one)
        last_loss = float(metrics["rel_loss"])
        if first_loss is None:
            first_loss = last_loss
    assert np.isfinite(last_loss)
    assert last_loss < 0.5 * first_loss, (first_loss, last_loss)

    # train-split sgdet recall: matched triplets need IoU>=0.5 + correct
    # classes + correct predicate — chance is far below 0.1
    eval_step = jax.jit(make_sgdet_eval_step(model, max_pairs=DETS * DETS))
    preds = jax.device_get(eval_step(state, batch))
    ev = SGGEvaluator(mode="sgdet", num_rel_classes=NUM_REL)
    for i, rec in enumerate(recs):
        dm = preds.det_mask[i]
        pm = preds.pair_mask[i]
        if dm.sum() == 0 or pm.sum() == 0 or len(rec["rel_tuples"]) == 0:
            continue
        remap = np.cumsum(dm) - 1
        ev.add_image(
            gt_boxes=rec["boxes"], gt_classes=rec["labels"],
            gt_rels=rec["rel_tuples"], pred_boxes=preds.boxes[i][dm],
            pred_classes=preds.obj_labels[i][dm],
            obj_scores=preds.obj_scores[i][dm],
            pred_rel_inds=remap[preds.pair_idx[i][pm]],
            rel_scores=preds.rel_scores[i][pm],
        )
    agg = ev.aggregate()
    assert agg["R"][20] >= 0.5, agg["R"]
