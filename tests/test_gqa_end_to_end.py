"""GQA-200 end-to-end (VERDICT r4 #5).

Covers the GQA side of the MEET/GCL machinery beyond the reader-level
test (test_gqa_and_coco.py): the group-split/statistics helpers compared
against the LIVE reference SHA_GCL_extra functions for BOTH datasets, a
GQA-shaped MEET routing + losses + post-process path at 201/101 classes,
and a synthetic predcls convergence run at GQA class counts.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_loader import REF_ROOT, reference_available

NUM_OBJ_GQA, NUM_REL_GQA = 201, 101


def _ref_gcl():
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from SHA_GCL_extra import extra_function_utils as efu
    from SHA_GCL_extra import group_chosen_function as gcf

    return gcf, efu


@pytest.mark.skipif(not reference_available(),
                    reason="/root/reference not mounted")
@pytest.mark.parametrize("dataset", ["VG", "GQA"])
@pytest.mark.parametrize("split", ["divide3", "divide4", "divide5", "average"])
def test_gcl_helpers_match_live_reference(dataset, split):
    """get_group_splits / incre_idx_list / sample-rate matrix equal the
    live SHA_GCL_extra implementations (group_chosen_function.py:6-94,
    extra_function_utils.py:39-70,185-257) for VG and GQA."""
    from veto_tpu.data.predicate_stats import (
        generate_sample_rate_matrix,
        get_group_splits,
        incre_idx_list,
        predicate_counts,
    )

    gcf, efu = _ref_gcl()
    ref_groups, ref_sizes = gcf.get_group_splits(dataset, split)
    groups, sizes = get_group_splits(dataset, split)
    assert sizes == list(ref_sizes)
    assert [list(g) for g in groups] == [list(g) for g in ref_groups]

    ref_incre, _, _, _ = efu.get_current_predicate_idx(
        ref_groups, 0.1, dataset)
    ours = incre_idx_list(sizes, len(predicate_counts(dataset)))
    np.testing.assert_array_equal(ours, np.asarray(ref_incre))

    ref_rate = efu.generate_sample_rate_vector_sep2(
        dataset, efu.generate_num_stage_vector(ref_groups))
    got = generate_sample_rate_matrix(dataset, sizes)
    np.testing.assert_allclose(got, np.asarray(ref_rate), rtol=1e-6)


def test_gqa_meet_routing_and_losses():
    """MEET config at GQA-200 scale: 4 divide4 groups over 101 predicates,
    routing reaches every group, per-group losses are finite, and the
    single-expert post-processor scatters group logits back to the 101-way
    vocabulary."""
    from veto_tpu.models.relation.predictor_meet import (
        make_meet_config,
        meet_group_labels,
        meet_losses,
        meet_route,
        postprocess_meet_single,
    )

    cfg = make_meet_config("GQA", "divide4")
    assert cfg.group_sizes == (5, 10, 20, 65)
    assert cfg.sample_rate.shape == (4, NUM_REL_GQA)
    assert int(cfg.incre_idx.max()) == 4

    P = 256
    rng = np.random.RandomState(0)
    labels = jnp.asarray(rng.randint(0, NUM_REL_GQA, P))
    mask = jnp.ones(P, bool)
    chosen = meet_route(
        jax.random.PRNGKey(0), labels, mask,
        jnp.asarray(cfg.incre_idx), jnp.asarray(cfg.sample_rate))
    assert chosen.shape == (P, 4)
    # every group trains on a nonempty subset at this scale
    assert bool(jnp.all(chosen.sum(0) > 0))

    glabels = meet_group_labels(labels, cfg.group_sizes)
    for k, gs in enumerate(cfg.group_sizes):
        assert int(glabels[k].max()) <= gs + 1  # in-group + bg + OOD

    glogits = (tuple(
        jnp.asarray(rng.randn(1, P, gs + 2).astype(np.float32))
        for gs in cfg.group_sizes
    ),)  # one expert, batch 1
    losses = meet_losses(
        jax.random.PRNGKey(2), glogits, labels[None], mask[None],
        jnp.asarray(cfg.incre_idx), jnp.asarray(cfg.sample_rate),
        cfg.group_sizes)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    obj_labels = jnp.asarray(rng.randint(1, NUM_OBJ_GQA, 8), jnp.int32)
    obj_scores = jnp.asarray(rng.rand(8).astype(np.float32))
    pair_idx = jnp.asarray(
        [(i, j) for i in range(8) for j in range(8) if i != j][:56],
        jnp.int32)
    pm = jnp.ones(56, bool)
    pred = postprocess_meet_single(
        tuple(g[0, :56] for g in glogits[0]), obj_labels, obj_scores,
        pair_idx, pm, cfg.group_sizes, NUM_REL_GQA)
    assert pred.rel_scores.shape[-1] == NUM_REL_GQA
    assert int(pred.rel_labels.min()) >= 1
    assert int(pred.rel_labels.max()) < NUM_REL_GQA


@pytest.mark.slow
def test_gqa_predcls_overfits_synthetic_corpus():
    """A tiny VETO at GQA class counts (201 obj / 101 rel) must overfit a
    synthetic corpus — the gtbox-path convergence proof at GQA scale
    (SURVEY §7 step 9)."""
    from veto_tpu.config.defaults import SolverConfig
    from veto_tpu.data.synthetic import SyntheticSGGDataset
    from veto_tpu.engine.train import (
        create_train_state, make_eval_step, make_train_step,
    )
    from veto_tpu.evaluation.sgg_eval import SGGEvaluator
    from veto_tpu.models.sgg import SGGModel
    from veto_tpu.solver.optim import make_optimizer

    MAX_BOXES = 8
    model = SGGModel(
        num_obj_classes=NUM_OBJ_GQA, num_rel_classes=NUM_REL_GQA,
        mode="predcls", stage_blocks=(1, 1, 1, 1), groups=1,
        width_per_group=16, fpn_channels=32, veto_dim=96, veto_layers=2,
        veto_heads=6, veto_depth_proj_dim=64, veto_visual_proj_dim=32,
        embed_dim=32, dtype=jnp.float32,
    )
    ds = SyntheticSGGDataset(
        num_images=8, image_size=(64, 64), num_obj_classes=NUM_OBJ_GQA,
        num_rel_classes=NUM_REL_GQA, max_objects=MAX_BOXES - 2,
        min_objects=3, max_relations=4, seed=21,
    )
    batch, recs = next(ds.batches(batch_size=8, max_boxes=MAX_BOXES))
    batch = jax.tree.map(jnp.asarray, batch)

    cfg = SolverConfig(base_lr=1e-3, ims_per_batch=8,
                       scale_lr_by_batch=False, warmup_iters=0,
                       grad_clip_norm=5.0)
    rng = jax.random.PRNGKey(0)
    pair_idx = jnp.zeros((8, 8, 2), jnp.int32)
    pair_mask = jnp.ones((8, 8), bool)
    variables = model.init(
        rng, batch.images, batch.depth, batch.boxes, batch.box_mask,
        batch.labels, batch.obj_logits, pair_idx, pair_mask, train=False,
    )
    tx = make_optimizer(cfg, variables["params"])
    state = create_train_state(model, tx, rng,
                               jax.tree.map(lambda x: x[:1], batch),
                               variables=variables)

    step = jax.jit(
        make_train_step(model, tx, None, batch_size_per_image=24),
        donate_argnums=(0,),
    )
    scale = jnp.asarray(1.0, jnp.float32)
    first = None
    for i in range(150):
        state, metrics = step(state, batch, scale)
        if first is None:
            first = float(metrics["rel_loss"])
    last = float(metrics["rel_loss"])
    assert last < first * 0.5, (first, last)

    eval_step = jax.jit(make_eval_step(model, max_pairs=MAX_BOXES ** 2))
    preds = jax.device_get(eval_step(state, batch))
    ev = SGGEvaluator(mode="predcls", num_rel_classes=NUM_REL_GQA)
    for i, rec in enumerate(recs):
        n = len(rec["boxes"])
        pm = preds.pair_mask[i]
        ev.add_image(
            rec["boxes"], rec["labels"], rec["rel_tuples"], rec["boxes"],
            preds.obj_labels[i][:n], preds.obj_scores[i][:n],
            preds.pair_idx[i][pm], preds.rel_scores[i][pm],
        )
    agg = ev.aggregate()
    assert agg["R"][20] > 0.5, agg["R"]
