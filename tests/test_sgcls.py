"""sgcls end-to-end: the frozen box predictor classifies GT boxes, the
relation head consumes its predict_logits / NMS'd pred_labels
(box_head.py:85-90 + add_predict_info:20-37)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from veto_tpu.config.defaults import SolverConfig
from veto_tpu.data.synthetic import SyntheticSGGDataset
from veto_tpu.engine.train import create_train_state, make_eval_step, make_train_step
from veto_tpu.evaluation.sgg_eval import SGGEvaluator
from veto_tpu.models.sgg import SGGModel
from veto_tpu.solver.optim import make_optimizer

NUM_OBJ, NUM_REL, N = 11, 7, 6


@pytest.fixture(scope="module")
def setup():
    model = SGGModel(
        num_obj_classes=NUM_OBJ, num_rel_classes=NUM_REL, mode="sgcls",
        stage_blocks=(1, 1, 1, 1), groups=1, width_per_group=16,
        fpn_channels=32, box_mlp_dim=64, dtype=jnp.float32,
    )
    ds = SyntheticSGGDataset(
        num_images=2, image_size=(64, 64), num_obj_classes=NUM_OBJ,
        num_rel_classes=NUM_REL, max_objects=4, min_objects=3, seed=9,
    )
    batch, recs = next(ds.batches(batch_size=2, max_boxes=N))
    batch = jax.tree.map(jnp.asarray, batch)
    rng = jax.random.PRNGKey(0)
    small = jax.tree.map(lambda x: x[:1], batch)
    pi = jnp.zeros((1, 8, 2), jnp.int32)
    params = model.init(
        rng, small.images, small.depth, small.boxes, small.box_mask,
        small.labels, small.obj_logits, pi, jnp.ones((1, 8), bool), train=False,
    )["params"]
    scfg = SolverConfig(base_lr=1e-3, ims_per_batch=2, scale_lr_by_batch=False,
                        warmup_iters=0)
    tx = make_optimizer(
        scfg, params,
        frozen_prefixes=("backbone", "rpn", "box_extractor", "box_predictor"),
    )
    state = create_train_state(model, tx, rng, small)
    return model, batch, recs, tx, state


def test_sgcls_params_include_box_head(setup):
    model, batch, recs, tx, state = setup
    assert "box_extractor" in state.params and "box_predictor" in state.params


def test_sgcls_train_and_eval(setup):
    model, batch, recs, tx, state = setup
    state = jax.tree.map(jnp.array, state)
    step = jax.jit(
        make_train_step(model, tx, None, batch_size_per_image=16, mode="sgcls"),
        donate_argnums=(0,),
    )
    box_before = jax.tree.map(np.asarray, jax.device_get(state.params["box_predictor"]))
    for _ in range(2):
        state, metrics = step(state, batch, jnp.asarray(1.0))
        assert np.isfinite(float(metrics["rel_loss"]))
        assert np.isfinite(float(metrics["obj_loss"]))
    # frozen box head untouched
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        box_before, jax.device_get(state.params["box_predictor"]),
    )

    eval_step = jax.jit(make_eval_step(model, max_pairs=N * N, mode="sgcls"))
    preds = jax.device_get(eval_step(state, batch))
    ev = SGGEvaluator(mode="sgcls", num_rel_classes=NUM_REL)
    for i, rec in enumerate(recs):
        n = len(rec["boxes"])
        pm = preds.pair_mask[i]
        # sgcls: object labels come from the model, NOT ground truth
        ev.add_image(
            rec["boxes"], rec["labels"], rec["rel_tuples"], rec["boxes"],
            preds.obj_labels[i][:n], preds.obj_scores[i][:n],
            preds.pair_idx[i][pm], preds.rel_scores[i][pm],
        )
    agg = ev.aggregate()
    assert 0.0 <= agg["R"][100] <= 1.0
    # predicted labels are in-range and not trivially all background
    assert (preds.obj_labels >= 1).all()


def test_sgcls_veto_obj_loss_is_onehot_constant(setup):
    """Pin the reference quirk: VETO's obj_dists are one-hot of the NMS
    pred labels (roi_relation_predictors.py:4129-4133), so the sgcls
    obj_loss is CE of a one-hot vs GT-assigned labels — a step-invariant
    constant that carries no gradient into the predictor (VERDICT weak #7)."""
    model, batch, recs, tx, state = setup
    state = jax.tree.map(jnp.array, state)
    step = jax.jit(
        make_train_step(model, tx, None, batch_size_per_image=16, mode="sgcls"),
        donate_argnums=(0,),
    )
    vals = []
    for _ in range(3):
        state, metrics = step(state, batch, jnp.asarray(1.0))
        vals.append(float(metrics["obj_loss"]))
    # one-hot logits: CE = log(sum exp) - z_y with z in {0,1}; since the
    # pred labels come from the FROZEN box head on fixed inputs, the value
    # cannot change across steps
    assert vals[0] == pytest.approx(vals[1], rel=1e-6)
    assert vals[1] == pytest.approx(vals[2], rel=1e-6)
