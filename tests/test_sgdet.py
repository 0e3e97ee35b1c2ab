"""End-to-end sgdet: full cascade init → train step → eval → metrics.

Covers the deepest reference path (SURVEY.md §3.3): backbone → RPN →
box head post-processing → detect_relsample → relation head →
sgdet relation post-processing (late obj NMS + per-class regression pick).
All on a tiny model / synthetic data, CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from veto_tpu.config.defaults import SolverConfig
from veto_tpu.data.synthetic import SyntheticSGGDataset
from veto_tpu.engine.train import (
    TrainState,
    make_sgdet_eval_step,
    make_sgdet_train_step,
)
from veto_tpu.evaluation.sgg_eval import SGGEvaluator
from veto_tpu.models.sgg import SGGModel
from veto_tpu.solver.optim import make_optimizer

NUM_OBJ, NUM_REL = 11, 7
MAX_BOXES = 6
IMG = (64, 64)
DETS = 8


def tiny_sgdet_model():
    return SGGModel(
        num_obj_classes=NUM_OBJ,
        num_rel_classes=NUM_REL,
        mode="sgdet",
        stage_blocks=(1, 1, 1, 1),
        groups=1,
        width_per_group=16,
        fpn_channels=32,
        rpn_pre_nms_top_n=64,
        rpn_post_nms_top_n=16,
        rpn_fpn_post_nms_top_n=24,
        detections_per_img=DETS,
        box_mlp_dim=64,
        dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def setup():
    model = tiny_sgdet_model()
    ds = SyntheticSGGDataset(
        num_images=4, image_size=IMG, num_obj_classes=NUM_OBJ,
        num_rel_classes=NUM_REL, max_objects=MAX_BOXES - 2, min_objects=3,
        max_relations=4, seed=3,
    )
    batch, recs = next(ds.batches(batch_size=4, max_boxes=MAX_BOXES))
    batch = jax.tree.map(jnp.asarray, batch)
    rng = jax.random.PRNGKey(0)
    small = jax.tree.map(lambda x: x[:1], batch)
    pi = jnp.zeros((1, 4, 2), jnp.int32)
    variables = model.init(
        rng, small.images, small.depth, small.boxes, small.box_mask,
        small.labels, small.obj_logits, pi, jnp.ones((1, 4), bool),
        method="init_all",
    )
    cfg = SolverConfig(base_lr=1e-3, ims_per_batch=4, scale_lr_by_batch=False,
                       warmup_iters=0)
    tx = make_optimizer(
        cfg, variables["params"],
        frozen_prefixes=("backbone", "rpn", "box_extractor", "box_predictor"),
    )
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        rng=rng,
    )
    return model, batch, recs, tx, state


def test_init_builds_full_tree(setup):
    model, batch, recs, tx, state = setup
    for key in ("backbone", "depth_backbone", "rpn", "box_extractor",
                "box_predictor", "relation"):
        assert key in state.params, key


def test_sgdet_train_step(setup):
    model, batch, recs, tx, state = setup
    state = jax.tree.map(jnp.array, state)
    step = jax.jit(
        make_sgdet_train_step(model, tx, None, batch_size_per_image=32),
        donate_argnums=(0,),
    )
    frozen_before = {
        k: jax.tree.map(np.asarray, jax.device_get(state.params[k]))
        for k in ("backbone", "rpn", "box_predictor")
    }
    for i in range(3):
        state, metrics = step(state, batch, jnp.asarray(1.0))
        assert np.isfinite(float(metrics["rel_loss"]))
        assert np.isfinite(float(metrics["obj_loss"]))
    for k, before in frozen_before.items():
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(a, b),
            before, jax.device_get(state.params[k]),
        )


def test_sgdet_eval_step_and_metrics(setup):
    model, batch, recs, tx, state = setup
    eval_step = jax.jit(make_sgdet_eval_step(model, max_pairs=DETS * DETS))
    preds = jax.device_get(eval_step(state, batch))

    # shapes / masks coherent
    assert preds.boxes.shape == (4, DETS, 4)
    assert preds.pair_idx.shape == (4, DETS * DETS, 2)
    ev = SGGEvaluator(mode="sgdet", num_rel_classes=NUM_REL)
    for i, rec in enumerate(recs):
        dm = preds.det_mask[i]
        pm = preds.pair_mask[i]
        nk = int(dm.sum())
        if nk == 0 or pm.sum() == 0:
            continue
        # pairs must point at valid detections
        assert (preds.pair_idx[i][pm] < DETS).all()
        # compact the detection axis: metrics consume unpadded arrays
        remap = np.cumsum(dm) - 1
        ev.add_image(
            gt_boxes=rec["boxes"],
            gt_classes=rec["labels"],
            gt_rels=rec["rel_tuples"],
            pred_boxes=preds.boxes[i][dm],
            pred_classes=preds.obj_labels[i][dm],
            obj_scores=preds.obj_scores[i][dm],
            pred_rel_inds=remap[preds.pair_idx[i][pm]],
            rel_scores=preds.rel_scores[i][pm],
        )
    agg = ev.aggregate()
    assert 0.0 <= agg["R"][100] <= 1.0


def test_sgdet_detection_boxes_clipped(setup):
    model, batch, recs, tx, state = setup
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    det = model.apply(
        variables, batch.images, batch.sizes.astype(jnp.float32),
        method="detect",
    )
    dets = jax.device_get(det.detections)
    for i in range(batch.images.shape[0]):
        m = dets.mask[i]
        if m.sum() == 0:
            continue
        b = dets.boxes[i][m]
        w, h = np.asarray(batch.sizes[i])
        assert (b[:, 0] >= 0).all() and (b[:, 1] >= 0).all()
        assert (b[:, 2] <= w - 1).all() and (b[:, 3] <= h - 1).all()
        assert (dets.labels[i][m] > 0).all()
