"""End-to-end predcls slice: init → sharded train steps → eval → metrics.

The reference had no such test (SURVEY.md §4 — correctness was validated by
benchmark numbers only); this is the hermetic replacement: a tiny model on
synthetic data, on the virtual 8-device CPU mesh, checking the loss moves
and the evaluator consumes real model output.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from veto_tpu.data.synthetic import SyntheticSGGDataset
from veto_tpu.engine.batch import SGGBatch
from veto_tpu.engine.train import (
    TrainState,
    batch_sharding,
    create_train_state,
    make_eval_step,
    make_mesh,
    make_train_step,
    shard_train_step,
)
from veto_tpu.evaluation.sgg_eval import SGGEvaluator
from veto_tpu.models.sgg import SGGModel
from veto_tpu.solver.optim import LRController, make_optimizer
from veto_tpu.config.defaults import SolverConfig

NUM_OBJ, NUM_REL = 21, 11
MAX_BOXES = 8
IMG = (64, 64)


def tiny_model(mode="predcls"):
    return SGGModel(
        num_obj_classes=NUM_OBJ,
        num_rel_classes=NUM_REL,
        mode=mode,
        stage_blocks=(1, 1, 1, 1),
        groups=1,
        width_per_group=16,
        fpn_channels=32,
        dtype=jnp.float32,
    )


def tiny_dataset(n=8):
    return SyntheticSGGDataset(
        num_images=n, image_size=IMG, num_obj_classes=NUM_OBJ,
        num_rel_classes=NUM_REL, max_objects=MAX_BOXES - 2, min_objects=3,
        max_relations=5, seed=7,
    )


@pytest.fixture(scope="module")
def setup():
    model = tiny_model()
    ds = tiny_dataset()
    batch, recs = next(ds.batches(batch_size=8, max_boxes=MAX_BOXES))
    cfg = SolverConfig(base_lr=1e-4, ims_per_batch=8, scale_lr_by_batch=False,
                       warmup_iters=0, grad_clip_norm=5.0)
    rng = jax.random.PRNGKey(0)
    # init with a single-image slice to keep compile fast
    small = jax.tree.map(lambda x: x[:1], batch)
    tx = make_optimizer(cfg, _init_params(model, rng, small))
    state = create_train_state(model, tx, rng, small)
    return model, ds, batch, recs, cfg, tx, state


def _init_params(model, rng, batch: SGGBatch):
    pair_idx = jnp.zeros((batch.images.shape[0], 8, 2), jnp.int32)
    pair_mask = jnp.ones((batch.images.shape[0], 8), bool)
    variables = model.init(
        rng, batch.images, batch.depth, batch.boxes, batch.box_mask,
        batch.labels, batch.obj_logits, pair_idx, pair_mask, train=False,
    )
    return variables["params"]


class TestTrainStep:
    def test_loss_decreases_and_detector_frozen(self, setup):
        model, ds, batch, recs, cfg, tx, state = setup
        # the sharded step donates its input state; work on a copy so the
        # module-scoped fixture stays alive for the other tests
        state = jax.tree.map(jnp.array, state)
        mesh = make_mesh(data=4, pair=2)
        step = make_train_step(
            model, tx, None, batch_size_per_image=16,
            positive_fraction=0.25, mesh=mesh,
        )
        step = shard_train_step(step, mesh)
        batch = jax.device_put(batch, batch_sharding(mesh))

        backbone_before = jax.tree.map(
            np.asarray, jax.device_get(state.params["backbone"])
        )

        # fixed held-out pair sample: the per-step training loss jumps around
        # because pairs are re-sampled each step, so measure progress on one
        # frozen sample instead
        from veto_tpu.models.relation.predictor_veto import weighted_ce_loss
        from veto_tpu.models.relation.sampling import gtbox_relsample

        keys = jax.random.split(jax.random.PRNGKey(42), batch.batch_size)
        fixed = jax.vmap(
            lambda k, r, m: gtbox_relsample(k, r, m, batch_size=16)
        )(keys, batch.rel_matrix, batch.box_mask)

        @jax.jit
        def fixed_loss(state):
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch.images, batch.depth, batch.boxes, batch.box_mask,
                batch.labels, batch.obj_logits, fixed.pair_idx, fixed.mask,
                train=False,
            )
            return weighted_ce_loss(out.rel_logits, fixed.labels, fixed.mask, None)

        loss_before = float(fixed_loss(state))
        ctrl = LRController(cfg)
        for i in range(8):
            scale = jnp.asarray(ctrl.scale(i), jnp.float32)
            state, metrics = step(state, batch, scale)
            assert np.isfinite(float(metrics["rel_loss"]))
        loss_after = float(fixed_loss(state))
        assert loss_after < loss_before, (loss_before, loss_after)
        # frozen detector: backbone params bit-identical after 6 steps
        backbone_after = jax.device_get(state.params["backbone"])
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(a, b),
            backbone_before, backbone_after,
        )
        # depth backbone must have moved
        diffs = jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            jax.device_get(state.params["depth_backbone"]),
            _init_params(model, jax.random.PRNGKey(0),
                         jax.tree.map(lambda x: x[:1], batch))["depth_backbone"],
        )
        assert max(jax.tree.leaves(diffs)) > 0

    def test_eval_step_and_metrics(self, setup):
        model, ds, batch, recs, cfg, tx, state = setup
        eval_step = jax.jit(make_eval_step(model, max_pairs=MAX_BOXES * MAX_BOXES))
        preds = eval_step(state, batch)
        preds = jax.device_get(preds)

        ev = SGGEvaluator(mode="predcls", num_rel_classes=NUM_REL)
        for i, rec in enumerate(recs):
            n = len(rec["boxes"])
            pm = preds.pair_mask[i]
            ev.add_image(
                gt_boxes=rec["boxes"],
                gt_classes=rec["labels"],
                gt_rels=rec["rel_tuples"],
                pred_boxes=rec["boxes"],
                pred_classes=preds.obj_labels[i][:n],
                obj_scores=preds.obj_scores[i][:n],
                pred_rel_inds=preds.pair_idx[i][pm],
                rel_scores=preds.rel_scores[i][pm],
            )
        agg = ev.aggregate()
        # with all candidate pairs present and K=100 > all pairs, graph-
        # constraint recall is bounded below by chance but must be defined
        assert 0.0 <= agg["R"][100] <= 1.0
        assert ev.num_images == len(recs)

    def test_predcls_r100_is_1_when_logits_match_gt(self, setup):
        """If relation logits encode the GT matrix, R@100 over all pairs = 1."""
        model, ds, batch, recs, cfg, tx, state = setup
        from veto_tpu.models.relation.postprocess import postprocess_relations
        from veto_tpu.models.relation.sampling import prepare_test_pairs

        ev = SGGEvaluator(mode="predcls", num_rel_classes=NUM_REL)
        for i, rec in enumerate(recs):
            n = len(rec["boxes"])
            mask = np.zeros(MAX_BOXES, bool)
            mask[:n] = True
            pair_idx, pair_mask = prepare_test_pairs(
                jnp.asarray(mask), jnp.ones(MAX_BOXES),
                max_pairs=MAX_BOXES * MAX_BOXES,
            )
            pi = np.asarray(pair_idx)
            labs = rec["rel_matrix"][pi[:, 0], pi[:, 1]]
            logits = np.full((len(pi), NUM_REL), -10.0, np.float32)
            logits[np.arange(len(pi)), labs] = 10.0
            obj_dists = np.eye(NUM_OBJ, dtype=np.float32)[
                np.pad(rec["labels"], (0, MAX_BOXES - n))
            ]
            pred = postprocess_relations(
                jnp.asarray(logits), jnp.asarray(obj_dists), pair_idx, pair_mask
            )
            pm = np.asarray(pred.pair_mask)
            ev.add_image(
                gt_boxes=rec["boxes"], gt_classes=rec["labels"],
                gt_rels=rec["rel_tuples"], pred_boxes=rec["boxes"],
                pred_classes=np.asarray(pred.obj_labels)[:n],
                obj_scores=np.asarray(pred.obj_scores)[:n],
                pred_rel_inds=np.asarray(pred.pair_idx)[pm],
                rel_scores=np.asarray(pred.rel_scores)[pm],
            )
        agg = ev.aggregate()
        assert agg["R"][100] == pytest.approx(1.0)
