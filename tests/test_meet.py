"""MEET ensemble tests: routing, in-group label remap, post-processing, and
an end-to-end tiny-model train/eval smoke (single-expert and voting)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from veto_tpu.data.predicate_stats import (
    generate_sample_rate_matrix,
    get_group_splits,
    incre_idx_list,
)
from veto_tpu.models.relation.predictor_meet import (
    MeetConfig,
    group_starts,
    make_meet_config,
    meet_group_labels,
    meet_losses,
    meet_route,
    postprocess_meet_single,
    postprocess_meet_voting,
)

NUM_OBJ, NUM_REL = 11, 12          # 11 fg predicates
GROUPS = (3, 4, 4)                 # 1 + 3 + 4 + 4 = 12
MAX_BOXES = 6
IMG = (64, 64)


def tiny_meet_cfg(experts=1, voting="C"):
    g = len(GROUPS)
    incre = np.zeros(NUM_REL, np.int64)
    starts = group_starts(GROUPS)
    for k, gs in enumerate(GROUPS):
        incre[starts[k]: starts[k] + gs] = k + 1
    rate = np.ones((g, NUM_REL), np.float64)
    return MeetConfig(
        group_sizes=GROUPS, incre_idx=incre, sample_rate=rate,
        experts_per_group=experts, voting=voting,
    )


def test_make_meet_config_vg_divide4():
    cfg = make_meet_config("VG", "divide4")
    assert cfg.group_sizes == (4, 6, 9, 19, 12)
    assert cfg.incre_idx.shape == (51,)
    assert cfg.incre_idx[0] == 0
    assert cfg.incre_idx[1] == 1 and cfg.incre_idx[4] == 1
    assert cfg.incre_idx[5] == 2 and cfg.incre_idx[50] == 5
    assert cfg.sample_rate.shape == (5, 51)
    # a label's own stage always accepts it (reference _sep2: rates for
    # classes at or below the group median are 1.0; later-group classes are
    # never thresholded below their own stage)
    for lab in range(1, 51):
        own = cfg.incre_idx[lab]
        assert cfg.sample_rate[own - 1, lab] > 0


def test_meet_route_invariants():
    cfg = tiny_meet_cfg()
    labels = jnp.asarray([0, 1, 4, 8, 11, -1, 0, 5])
    mask = labels >= 0
    member = np.asarray(
        meet_route(jax.random.PRNGKey(0), labels, mask,
                   jnp.asarray(cfg.incre_idx), jnp.asarray(cfg.sample_rate))
    )
    # padding: no membership
    assert member[5].sum() == 0
    # bg: exactly one group
    assert member[0].sum() == 1 and member[6].sum() == 1
    incre = cfg.incre_idx
    for i, lab in enumerate([0, 1, 4, 8, 11, -1, 0, 5]):
        if lab <= 0:
            continue
        row = member[i]
        # membership is a prefix [0, act)
        on = np.where(row)[0]
        assert len(on) > 0 and (on == np.arange(len(on))).all()
        # with all-ones thresholds the top stage always accepts → full prefix
        assert row.all()


def test_meet_route_own_group_reachable():
    """With real VG thresholds the label's own group is always included
    (act_idx >= rel_group - 1 guaranteed by the `act < rel_idx` escape, and
    the own stage's threshold accepts with prob sample_rate[own-1][lab])."""
    cfg = make_meet_config("VG", "divide4")
    labels = jnp.asarray(np.arange(1, 51))
    mask = jnp.ones((50,), bool)
    member = np.asarray(
        meet_route(jax.random.PRNGKey(1), labels, mask,
                   jnp.asarray(cfg.incre_idx), jnp.asarray(cfg.sample_rate))
    )
    for i in range(50):
        own = cfg.incre_idx[i + 1]
        on = np.where(member[i])[0]
        assert (on == np.arange(len(on))).all()     # prefix
        assert len(on) >= own - 1                   # at least groups < own


def test_meet_group_labels():
    labels = jnp.asarray([0, 1, 3, 4, 8, 11, -1])
    gl = meet_group_labels(labels, GROUPS)
    # group 0 covers ids 1..3: in-group = id, others OOD = 4
    np.testing.assert_array_equal(np.asarray(gl[0]), [0, 1, 3, 4, 4, 4, -1])
    # group 1 covers ids 4..7: 4 → 1; 8 OOD → 5
    np.testing.assert_array_equal(np.asarray(gl[1]), [0, 5, 5, 1, 5, 5, -1])
    # group 2 covers ids 8..11: 8 → 1, 11 → 4
    np.testing.assert_array_equal(np.asarray(gl[2]), [0, 5, 5, 5, 1, 4, -1])


def test_meet_losses_keys():
    cfg = tiny_meet_cfg(experts=2)
    p = 16
    logits = tuple(
        tuple(jnp.zeros((2, p, gs + 2)) for gs in GROUPS) for _ in range(2)
    )
    labels = jnp.zeros((2, p), jnp.int32)
    mask = jnp.ones((2, p), bool)
    losses = meet_losses(
        jax.random.PRNGKey(0), logits, labels, mask,
        jnp.asarray(cfg.incre_idx), jnp.asarray(cfg.sample_rate), GROUPS,
    )
    assert set(losses) == {
        f"group_{k}{e + 1}_CE_loss" for k in range(3) for e in range(2)
    }
    for v in losses.values():
        assert np.isfinite(float(v))


def test_postprocess_meet_single_scatter():
    p, n = 4, 3
    pair_idx = jnp.asarray([[0, 1], [1, 2], [2, 0], [0, 0]])
    pair_mask = jnp.asarray([True, True, True, False])
    obj_labels = jnp.asarray([2, 3, 1], jnp.int32)
    obj_scores = jnp.asarray([0.9, 0.8, 0.7])
    # group 0 (ids 1..3): make pair 0 strongly predict in-group class 2 → id 2
    g0 = jnp.full((p, GROUPS[0] + 2), -5.0).at[0, 2].set(5.0)
    g1 = jnp.full((p, GROUPS[1] + 2), -5.0).at[1, 1].set(5.0)  # id 4
    g2 = jnp.full((p, GROUPS[2] + 2), -5.0)
    pred = postprocess_meet_single(
        [g0, g1, g2], obj_labels, obj_scores, pair_idx, pair_mask,
        GROUPS, NUM_REL,
    )
    assert pred.pair_idx.shape == (3 * p, 2)
    pm = np.asarray(pred.pair_mask)
    assert pm.sum() == 9  # 3 groups x 3 valid pairs
    # top-ranked candidate: group 0's pair 0 (highest obj scores + max prob)
    assert np.asarray(pred.rel_labels)[0] == 2
    np.testing.assert_array_equal(np.asarray(pred.pair_idx)[0], [0, 1])
    # its scattered prob row has mass only at [0] + group-0 ids 1..3
    row = np.asarray(pred.rel_scores)[0]
    assert row[2] > 0.9
    assert row[GROUPS[0] + 1:].sum() == 0.0
    # triple scores descend over valid entries
    probs = np.asarray(pred.rel_scores)
    assert pm[:9].all() and not pm[9:].any()


def test_postprocess_meet_voting_consensus():
    p = 2
    pair_idx = jnp.asarray([[0, 1], [1, 0]])
    pair_mask = jnp.asarray([True, True])
    obj_labels = jnp.asarray([1, 2], jnp.int32)
    obj_scores = jnp.asarray([1.0, 1.0])

    def head(cls_idx):
        # one group head (gs+2 cols) voting for in-group class cls_idx
        return jnp.full((p, GROUPS[0] + 2), -5.0).at[:, cls_idx].set(5.0)

    # group 0: experts agree on class 1 for all pairs; groups 1, 2: disagree
    def disagreeing(gs, seed):
        outs = []
        for e in range(3):
            outs.append(jnp.full((p, gs + 2), -5.0).at[:, 1 + e % gs].set(5.0))
        return outs

    logits = (
        (head(1), disagreeing(GROUPS[1], 0)[0], disagreeing(GROUPS[2], 0)[0]),
        (head(1), disagreeing(GROUPS[1], 0)[1], disagreeing(GROUPS[2], 0)[1]),
        (head(1), disagreeing(GROUPS[1], 0)[2], disagreeing(GROUPS[2], 0)[2]),
    )
    pred = postprocess_meet_voting(
        logits, obj_labels, obj_scores, pair_idx, pair_mask, GROUPS, NUM_REL,
        voting="C",
    )
    pm = np.asarray(pred.pair_mask)
    # only group 0 survives (full agreement); groups 1/2 all-disagree
    assert pm.sum() == 2
    assert (np.asarray(pred.rel_labels)[pm] == 1).all()

    pred_u = postprocess_meet_voting(
        logits, obj_labels, obj_scores, pair_idx, pair_mask, GROUPS, NUM_REL,
        voting="U",
    )
    assert np.asarray(pred_u.pair_mask).sum() == 2


@pytest.mark.parametrize("experts", [1, 3])
def test_meet_end_to_end(experts):
    from veto_tpu.config.defaults import SolverConfig
    from veto_tpu.data.synthetic import SyntheticSGGDataset
    from veto_tpu.engine.train import (
        create_train_state,
        make_meet_eval_step,
        make_train_step,
    )
    from veto_tpu.evaluation.sgg_eval import SGGEvaluator
    from veto_tpu.models.sgg import SGGModel
    from veto_tpu.solver.optim import make_optimizer

    cfg = tiny_meet_cfg(experts=experts)
    model = SGGModel(
        num_obj_classes=NUM_OBJ, num_rel_classes=NUM_REL, mode="predcls",
        stage_blocks=(1, 1, 1, 1), groups=1, width_per_group=16,
        fpn_channels=32, meet_group_sizes=GROUPS, meet_experts=experts,
        dtype=jnp.float32,
    )
    ds = SyntheticSGGDataset(
        num_images=4, image_size=IMG, num_obj_classes=NUM_OBJ,
        num_rel_classes=NUM_REL, max_objects=MAX_BOXES - 2, min_objects=3,
        max_relations=4, seed=11,
    )
    batch, recs = next(ds.batches(batch_size=4, max_boxes=MAX_BOXES))
    batch = jax.tree.map(jnp.asarray, batch)
    rng = jax.random.PRNGKey(0)
    small = jax.tree.map(lambda x: x[:1], batch)
    scfg = SolverConfig(base_lr=1e-3, ims_per_batch=4, scale_lr_by_batch=False,
                        warmup_iters=0)
    pi = jnp.zeros((1, 8, 2), jnp.int32)
    params = model.init(
        rng, small.images, small.depth, small.boxes, small.box_mask,
        small.labels, small.obj_logits, pi, jnp.ones((1, 8), bool),
        train=False,
    )["params"]
    tx = make_optimizer(scfg, params)
    state = create_train_state(model, tx, rng, small)

    step = jax.jit(
        make_train_step(model, tx, None, batch_size_per_image=16, meet=cfg),
        donate_argnums=(0,),
    )
    for _ in range(2):
        state, metrics = step(state, batch, jnp.asarray(1.0))
    for k in range(len(GROUPS)):
        for e in range(experts):
            assert np.isfinite(float(metrics[f"group_{k}{e + 1}_CE_loss"]))

    eval_step = jax.jit(
        make_meet_eval_step(model, cfg, max_pairs=MAX_BOXES * MAX_BOXES)
    )
    preds, boxes, det_mask = jax.device_get(eval_step(state, batch))
    ev = SGGEvaluator(mode="predcls", num_rel_classes=NUM_REL)
    for i, rec in enumerate(recs):
        n = len(rec["boxes"])
        pm = preds.pair_mask[i]
        if pm.sum() == 0:
            continue
        ev.add_image(
            gt_boxes=rec["boxes"], gt_classes=rec["labels"],
            gt_rels=rec["rel_tuples"], pred_boxes=rec["boxes"],
            pred_classes=preds.obj_labels[i][:n],
            obj_scores=preds.obj_scores[i][:n],
            pred_rel_inds=preds.pair_idx[i][pm],
            rel_scores=preds.rel_scores[i][pm],
        )
    agg = ev.aggregate()
    assert 0.0 <= agg["R"][100] <= 1.0

@pytest.mark.parametrize("predictor", ["MotifPredictor", "TransLikePredictor"])
def test_meet_legacy_end_to_end(predictor):
    """Legacy *_MEET variants (MotifPredictor_MEET :1154-1441,
    TransLikePredictor_MEET :1581-1828): per-group heads on the legacy
    contexts ride the same routing/loss/postprocess machinery."""
    from veto_tpu.config.defaults import SolverConfig
    from veto_tpu.data.synthetic import SyntheticSGGDataset
    from veto_tpu.engine.train import (
        create_train_state,
        make_meet_eval_step,
        make_train_step,
    )
    from veto_tpu.models.sgg import SGGModel
    from veto_tpu.solver.optim import make_optimizer

    cfg = tiny_meet_cfg(experts=1)
    model = SGGModel(
        num_obj_classes=NUM_OBJ, num_rel_classes=NUM_REL, mode="predcls",
        predictor=predictor, stage_blocks=(1, 1, 1, 1), groups=1,
        width_per_group=16, fpn_channels=32, meet_group_sizes=GROUPS,
        meet_experts=1, context_hidden_dim=32, context_pooling_dim=64,
        dtype=jnp.float32,
    )
    ds = SyntheticSGGDataset(
        num_images=2, image_size=IMG, num_obj_classes=NUM_OBJ,
        num_rel_classes=NUM_REL, max_objects=MAX_BOXES - 2, min_objects=3,
        max_relations=4, seed=12,
    )
    batch, recs = next(ds.batches(batch_size=2, max_boxes=MAX_BOXES))
    batch = jax.tree.map(jnp.asarray, batch)
    rng = jax.random.PRNGKey(0)
    small = jax.tree.map(lambda x: x[:1], batch)
    scfg = SolverConfig(base_lr=1e-3, ims_per_batch=2, scale_lr_by_batch=False,
                        warmup_iters=0)
    pi = jnp.zeros((1, 8, 2), jnp.int32)
    params = model.init(
        rng, small.images, small.depth, small.boxes, small.box_mask,
        small.labels, small.obj_logits, pi, jnp.ones((1, 8), bool),
        train=False,
    )["params"]
    # the MEET heads replaced the single classifier
    rel_params = params["relation"]
    assert "meet_heads" in rel_params
    assert f"rel_out_e0_g{len(GROUPS) - 1}" in rel_params["meet_heads"]

    tx = make_optimizer(scfg, params)
    state = create_train_state(model, tx, rng, small)
    step = jax.jit(
        make_train_step(model, tx, None, batch_size_per_image=16, meet=cfg),
        donate_argnums=(0,),
    )
    state, metrics = step(state, batch, jnp.asarray(1.0))
    for k in range(len(GROUPS)):
        assert np.isfinite(float(metrics[f"group_{k}1_CE_loss"]))

    eval_step = jax.jit(
        make_meet_eval_step(model, cfg, max_pairs=MAX_BOXES * MAX_BOXES)
    )
    preds, boxes, det_mask = jax.device_get(eval_step(state, batch))
    assert preds.rel_scores.shape[-1] == NUM_REL
    assert np.isfinite(preds.rel_scores[preds.pair_mask]).all()
