"""Legacy predictor zoo: unit smoke across modes + SGGModel integration.

Covers TransformerPredictor / IMPPredictor / MotifPredictor (SURVEY.md §2.5
legacy zoo) on the padded batched layout, plus the union-feature extractor
and the center-x-sorted masked biLSTM machinery behind Motifs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from veto_tpu.models.relation.legacy import (
    AGRCNNPredictor,
    BGNNPredictor,
    GPSNetPredictor,
    KERNPredictor,
    IMPPredictor,
    MotifPredictor,
    NaivePredictor,
    RelatednessTestPredictor,
    TransformerPredictor,
    TransLikePredictor,
)
from veto_tpu.models.relation.legacy.lstm import (
    HighwayDecoderLSTM,
    MaskedBiLSTM,
    centerx_perm,
)

B, N, P, D = 2, 6, 10, 64
NUM_OBJ, NUM_REL = 11, 7


@pytest.fixture(scope="module")
def inputs(request):
    rng = np.random.RandomState(0)
    boxes = np.sort(rng.uniform(0, 100, (B, N, 2, 2)), axis=2).reshape(B, N, 4)
    boxes[..., 2:] += 5.0
    return dict(
        boxes=jnp.asarray(boxes.astype(np.float32)),
        mask=jnp.asarray(np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], bool)),
        labels=jnp.asarray(rng.randint(1, NUM_OBJ, (B, N))),
        logits=jnp.asarray(rng.randn(B, N, NUM_OBJ).astype(np.float32)),
        pi=jnp.asarray(rng.randint(0, 4, (B, P, 2))),
        pmask=jnp.ones((B, P), bool),
        roi=jnp.asarray(rng.randn(B, N, D).astype(np.float32)),
        uni=jnp.asarray(rng.randn(B, P, D).astype(np.float32)),
        sizes=jnp.asarray([[100.0, 100.0]] * B),
    )


@pytest.mark.parametrize("mode", ["predcls", "sgcls", "sgdet"])
@pytest.mark.parametrize(
    "cls,extra",
    [
        (TransformerPredictor, {"embed_dim": 16}),
        (TransLikePredictor, {"embed_dim": 16}),
        (IMPPredictor, {}),
        (MotifPredictor, {"embed_dim": 16}),
        (BGNNPredictor, {}),
        (GPSNetPredictor, {}),
        (KERNPredictor, {"embed_dim": 16}),
        (NaivePredictor, {}),
        (RelatednessTestPredictor, {}),
        (AGRCNNPredictor, {"graph_hidden_dim": 32}),
        (AGRCNNPredictor, {"graph_hidden_dim": 32,
                           "use_obj_recls_logits": True,
                           "mp_on_valid_pairs": True, "mp_valid_pairs": 4}),
    ],
    ids=["transformer", "translike", "imp", "motifs", "bgnn", "gpsnet",
         "kern", "naive", "relatedness", "agrcnn", "agrcnn_recls"],
)
def test_legacy_predictor_modes(inputs, mode, cls, extra):
    m = cls(num_obj_classes=NUM_OBJ, num_rel_classes=NUM_REL, hidden_dim=32,
            pooling_dim=D, in_channels=D, mode=mode, **extra)
    args = (inputs["boxes"], inputs["mask"], inputs["labels"], inputs["logits"],
            inputs["pi"], inputs["pmask"], inputs["roi"], inputs["uni"],
            inputs["sizes"])
    variables = m.init(jax.random.PRNGKey(0), *args, train=True)
    out, _ = m.apply(variables, *args, train=True, mutable=["batch_stats"])
    assert out.rel_dists.shape == (B, P, NUM_REL)
    assert out.obj_dists.shape == (B, N, NUM_OBJ)
    assert np.isfinite(np.asarray(out.rel_dists)).all()
    out_eval = m.apply(variables, *args, train=False)
    assert np.isfinite(np.asarray(out_eval.rel_dists)).all()
    if mode == "predcls":
        np.testing.assert_array_equal(
            np.asarray(out_eval.obj_preds), np.asarray(inputs["labels"])
        )
    else:
        preds = np.asarray(out_eval.obj_preds)
        assert preds.shape == (B, N)
        assert (preds >= 0).all() and (preds < NUM_OBJ).all()


def test_centerx_perm_matches_reference_order():
    """Descending center-x, padding last (sort_by_score sorts descending on
    the normalized c_x score — utils_motifs.py:61-89)."""
    boxes = jnp.asarray(
        [[[50, 0, 60, 10], [10, 0, 20, 10], [30, 0, 40, 10], [0, 0, 0, 0]]],
        jnp.float32,
    )
    mask = jnp.asarray([[True, True, True, False]])
    perm, inv = jax.vmap(centerx_perm)(boxes, mask)
    np.testing.assert_array_equal(np.asarray(perm)[0], [0, 2, 1, 3])
    # inverse really inverts
    x = jnp.arange(4)[None].repeat(1, 0)
    sorted_x = jnp.take_along_axis(x, perm, 1)
    np.testing.assert_array_equal(
        np.asarray(jnp.take_along_axis(sorted_x, inv, 1))[0], np.arange(4)
    )


def test_masked_bilstm_padding_invariant(rng):
    """Padded steps must not affect valid outputs (PackedSequence parity)."""
    m = MaskedBiLSTM(hidden=8)
    x = jnp.asarray(rng.randn(1, 5, 4).astype(np.float32))
    mask_full = jnp.asarray([[True, True, True, False, False]])
    variables = m.init(jax.random.PRNGKey(0), x, mask_full)
    y1 = m.apply(variables, x, mask_full)
    # corrupt padding inputs: valid outputs unchanged
    x2 = x.at[:, 3:].set(99.0)
    y2 = m.apply(variables, x2, mask_full)
    np.testing.assert_allclose(
        np.asarray(y1)[:, :3], np.asarray(y2)[:, :3], atol=1e-6
    )


def test_decoder_teacher_forcing_uses_gt(rng):
    m = HighwayDecoderLSTM(num_obj_classes=NUM_OBJ, embed_dim=8, hidden=16)
    feats = jnp.asarray(rng.randn(1, 4, 12).astype(np.float32))
    mask = jnp.ones((1, 4), bool)
    gt = jnp.asarray([[3, 0, 5, 2]])
    variables = m.init(jax.random.PRNGKey(0), feats, mask, gt, True)
    logits, refined = m.apply(variables, feats, mask, gt, True)
    r = np.asarray(refined)[0]
    # GT labels pass through; bg slots replaced by an fg prediction
    assert r[0] == 3 and r[2] == 5 and r[3] == 2
    assert 1 <= r[1] < NUM_OBJ


def test_sggmodel_legacy_integration():
    from veto_tpu.config.defaults import SolverConfig
    from veto_tpu.data.synthetic import SyntheticSGGDataset
    from veto_tpu.engine.train import create_train_state, make_eval_step, make_train_step
    from veto_tpu.models.sgg import SGGModel
    from veto_tpu.solver.optim import make_optimizer

    model = SGGModel(
        num_obj_classes=NUM_OBJ, num_rel_classes=NUM_REL, mode="predcls",
        predictor="MotifPredictor", stage_blocks=(1, 1, 1, 1), groups=1,
        width_per_group=16, fpn_channels=32, context_hidden_dim=32,
        context_pooling_dim=64, dtype=jnp.float32,
    )
    ds = SyntheticSGGDataset(
        num_images=2, image_size=(64, 64), num_obj_classes=NUM_OBJ,
        num_rel_classes=NUM_REL, max_objects=4, min_objects=3, seed=2,
    )
    batch, recs = next(ds.batches(batch_size=2, max_boxes=N))
    batch = jax.tree.map(jnp.asarray, batch)
    small = jax.tree.map(lambda x: x[:1], batch)
    scfg = SolverConfig(base_lr=1e-3, ims_per_batch=2, scale_lr_by_batch=False,
                        warmup_iters=0)
    rng_ = jax.random.PRNGKey(0)
    pi = jnp.zeros((1, 8, 2), jnp.int32)
    params = model.init(
        rng_, small.images, small.depth, small.boxes, small.box_mask,
        small.labels, small.obj_logits, pi, jnp.ones((1, 8), bool), train=False,
    )["params"]
    assert "union_extractor" in params and "rel_box_extractor" in params
    tx = make_optimizer(scfg, params)
    state = create_train_state(model, tx, rng_, small)
    step = jax.jit(make_train_step(model, tx, None, batch_size_per_image=16))
    state, metrics = step(state, batch, jnp.asarray(1.0))
    assert np.isfinite(float(metrics["rel_loss"]))
    eval_step = jax.jit(make_eval_step(model, max_pairs=N * N))
    preds = jax.device_get(eval_step(state, batch))
    assert preds.rel_scores.shape[-1] == NUM_REL

def test_relatedness_aux_loss_in_train_step():
    """RelatednessTestPredictor emits relness logits and the train step adds
    the auxiliary RelAwareLoss (roi_relation_predictors.py:2770-2780)."""
    from veto_tpu.config.defaults import SolverConfig
    from veto_tpu.data.synthetic import SyntheticSGGDataset
    from veto_tpu.engine.train import create_train_state, make_train_step
    from veto_tpu.models.sgg import SGGModel
    from veto_tpu.solver.optim import make_optimizer

    model = SGGModel(
        num_obj_classes=NUM_OBJ, num_rel_classes=NUM_REL, mode="predcls",
        predictor="RelatednessTestPredictor", stage_blocks=(1, 1, 1, 1),
        groups=1, width_per_group=16, fpn_channels=32, context_hidden_dim=32,
        context_pooling_dim=64, dtype=jnp.float32,
    )
    ds = SyntheticSGGDataset(
        num_images=2, image_size=(64, 64), num_obj_classes=NUM_OBJ,
        num_rel_classes=NUM_REL, max_objects=4, min_objects=3, seed=3,
    )
    batch, _ = next(ds.batches(batch_size=2, max_boxes=N))
    batch = jax.tree.map(jnp.asarray, batch)
    small = jax.tree.map(lambda x: x[:1], batch)
    scfg = SolverConfig(base_lr=1e-3, ims_per_batch=2, scale_lr_by_batch=False,
                        warmup_iters=0)
    rng_ = jax.random.PRNGKey(0)
    pi = jnp.zeros((1, 8, 2), jnp.int32)
    params = model.init(
        rng_, small.images, small.depth, small.boxes, small.box_mask,
        small.labels, small.obj_logits, pi, jnp.ones((1, 8), bool), train=False,
    )["params"]
    assert "rel_pn_module" in params["relation"]
    tx = make_optimizer(scfg, params)
    state = create_train_state(model, tx, rng_, small)
    step = jax.jit(make_train_step(model, tx, None, batch_size_per_image=16))
    state, metrics = step(state, batch, jnp.asarray(1.0))
    assert np.isfinite(float(metrics["pre_rel_classify_loss"]))
    assert np.isfinite(float(metrics["rel_loss"]))


def test_bgnn_rel_aware_mode(inputs):
    """Relation-confidence-aware BGNN (model_bgnn.py:240-620): confidence
    module params, learnable scaling gate, top-k message filtering, and
    relness logits surfaced for the auxiliary loss."""
    m = BGNNPredictor(
        num_obj_classes=NUM_OBJ, num_rel_classes=NUM_REL, hidden_dim=32,
        pooling_dim=D, in_channels=D, mode="predcls", rel_aware=True,
        mp_valid_pairs=4,
    )
    args = (inputs["boxes"], inputs["mask"], inputs["labels"], inputs["logits"],
            inputs["pi"], inputs["pmask"], inputs["roi"], inputs["uni"],
            inputs["sizes"])
    variables = m.init(jax.random.PRNGKey(0), *args, train=True)
    assert "relation_conf_aware_models" in variables["params"]
    assert "relness_alpha" in variables["params"]
    out = m.apply(variables, *args, train=False)
    assert out.relness_logits.shape == (B, P, NUM_REL)
    assert out.rel_dists.shape == (B, P, NUM_REL)
    assert np.isfinite(np.asarray(out.rel_dists)).all()
