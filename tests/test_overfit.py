"""Synthetic convergence test: tiny VETO must OVERFIT its train split.

A single-step "loss moves" check (test_end_to_end.py) cannot catch wiring
bugs like shuffled pair labels or dead gradients through the trunk; actually
driving train R@20 far above chance can.  The reference has nothing
comparable (SURVEY.md §4) — correctness there was validated by full
benchmark runs only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from veto_tpu.config.defaults import SolverConfig
from veto_tpu.data.synthetic import SyntheticSGGDataset
from veto_tpu.engine.train import (
    batch_sharding,
    create_train_state,
    make_eval_step,
    make_mesh,
    make_train_step,
    shard_train_step,
)
from veto_tpu.evaluation.sgg_eval import SGGEvaluator
from veto_tpu.models.sgg import SGGModel
from veto_tpu.solver.optim import make_optimizer

NUM_OBJ, NUM_REL = 13, 9
MAX_BOXES = 8
IMG = (64, 64)
STEPS = 150


@pytest.mark.slow
def test_predcls_overfits_synthetic_corpus():
    model = SGGModel(
        num_obj_classes=NUM_OBJ, num_rel_classes=NUM_REL, mode="predcls",
        stage_blocks=(1, 1, 1, 1), groups=1, width_per_group=16,
        fpn_channels=32, veto_dim=96, veto_layers=2, veto_heads=6,
        veto_depth_proj_dim=64, veto_visual_proj_dim=32, embed_dim=32,
        dtype=jnp.float32,
    )
    ds = SyntheticSGGDataset(
        num_images=8, image_size=IMG, num_obj_classes=NUM_OBJ,
        num_rel_classes=NUM_REL, max_objects=MAX_BOXES - 2, min_objects=3,
        max_relations=4, seed=11,
    )
    batch, recs = next(ds.batches(batch_size=8, max_boxes=MAX_BOXES))
    batch = jax.tree.map(jnp.asarray, batch)

    cfg = SolverConfig(base_lr=1e-3, ims_per_batch=8, scale_lr_by_batch=False,
                       warmup_iters=0, grad_clip_norm=5.0)
    rng = jax.random.PRNGKey(0)
    pair_idx = jnp.zeros((8, 8, 2), jnp.int32)
    pair_mask = jnp.ones((8, 8), bool)
    variables = model.init(
        rng, batch.images, batch.depth, batch.boxes, batch.box_mask,
        batch.labels, batch.obj_logits, pair_idx, pair_mask, train=False,
    )
    tx = make_optimizer(cfg, variables["params"])
    state = create_train_state(model, tx, rng, jax.tree.map(lambda x: x[:1], batch))

    mesh = make_mesh(data=4, pair=2)
    step = make_train_step(
        model, tx, None, batch_size_per_image=16, positive_fraction=0.5,
        mesh=mesh,
    )
    step = shard_train_step(step, mesh)
    batch_sh = jax.device_put(batch, batch_sharding(mesh))

    first_loss = None
    loss = None
    for i in range(STEPS):
        state, metrics = step(state, batch_sh, jnp.asarray(1.0, jnp.float32))
        loss = float(metrics["rel_loss"])
        if first_loss is None:
            first_loss = loss
    assert np.isfinite(loss)
    # the per-step sample changes every step, so this is a real (resampled)
    # train loss, not the same batch memorized verbatim
    assert loss < 0.35 * first_loss, (first_loss, loss)

    # train-split recall must be far above chance (~0.1 for random scores)
    eval_step = jax.jit(make_eval_step(model, max_pairs=MAX_BOXES * MAX_BOXES))
    preds = jax.device_get(eval_step(state, batch))
    ev = SGGEvaluator(mode="predcls", num_rel_classes=NUM_REL)
    for i, rec in enumerate(recs):
        n = len(rec["boxes"])
        pm = preds.pair_mask[i]
        ev.add_image(
            gt_boxes=rec["boxes"], gt_classes=rec["labels"],
            gt_rels=rec["rel_tuples"], pred_boxes=rec["boxes"],
            pred_classes=preds.obj_labels[i][:n],
            obj_scores=preds.obj_scores[i][:n],
            pred_rel_inds=preds.pair_idx[i][pm],
            rel_scores=preds.rel_scores[i][pm],
        )
    agg = ev.aggregate()
    assert agg["R"][20] >= 0.5, agg["R"]
