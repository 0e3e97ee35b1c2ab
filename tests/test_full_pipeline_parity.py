"""Full-pipeline parity vs the REFERENCE stack (VERDICT r2 #2).

Module-level parity (test_torch_parity.py) proves each block equal; these
tests prove the COMPOSITION: pair enumeration → predictor → post-processor
→ evaluator, run side-by-side — the reference pipeline through its real
`RelationSampling.prepare_test_pairs` (sampling.py:31-52) and real
`PostProcessor` (inference.py:398-453), the rebuild through
`prepare_test_pairs` / `postprocess_relations(_sgdet)` — into one shared
metric kernel (`SGGEvaluator`, itself golden-bit-parity tested), asserting
identical orderings and identical R@K/mR@K.  Ordering bugs (sort
direction, bg-masking, duplicate-pair handling, `boxes_per_cls` picks)
live exactly here.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_loader import (
    load_ref_inference,
    load_ref_rel_sampling,
    load_ref_utils_motifs,
    make_cfg,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not mounted"
)

N_OBJ = 5            # 20 candidate pairs — all within every K
NUM_OBJ, NUM_REL, C = 151, 51, 256
IMG_W, IMG_H = 120, 100


def _post_cfg():
    return make_cfg(
        MODEL__ROI_RELATION_HEAD__RELATION_PROPOSAL_MODEL__SET_ON=False,
        MODEL__ROI_RELATION_HEAD__RELATION_PROPOSAL_MODEL__METHOD="",
        MODEL__ROI_RELATION_HEAD__USE_BINARY_LOSS=False,
    )


def _scene(seed):
    rng = np.random.RandomState(seed)
    boxes = np.zeros((N_OBJ, 4), np.float32)
    boxes[:, 0] = rng.uniform(0, IMG_W * 0.6, N_OBJ)
    boxes[:, 1] = rng.uniform(0, IMG_H * 0.6, N_OBJ)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(10, IMG_W * 0.4, N_OBJ)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(10, IMG_H * 0.4, N_OBJ)
    labels = rng.randint(1, NUM_OBJ, N_OBJ).astype(np.int64)
    pairs = [(i, j) for i in range(N_OBJ) for j in range(N_OBJ) if i != j]
    sel = rng.choice(len(pairs), 4, replace=False)
    gt_rels = np.array(
        [[pairs[s][0], pairs[s][1], rng.randint(1, NUM_REL)] for s in sel],
        np.int64,
    )
    roi = rng.randn(N_OBJ, C, 8, 8).astype(np.float32)
    depth = rng.randn(N_OBJ, C, 8, 8).astype(np.float32)
    return boxes, labels, gt_rels, roi, depth


def _ref_boxlist(boxes, **fields):
    from ref_loader import load_ref_bounding_box

    bl = load_ref_bounding_box().BoxList(
        torch.from_numpy(boxes), (IMG_W, IMG_H), "xyxy")
    for k, v in fields.items():
        bl.add_field(k, torch.from_numpy(v))
    return bl


def _ref_test_pairs(boxes, scores=None, use_gt_box=True, max_pairs=2048):
    smp = load_ref_rel_sampling()
    sampler = smp.RelationSampling(
        fg_thres=0.5, require_overlap=False, num_sample_per_gt_rel=4,
        batch_size_per_image=1024, positive_fraction=0.25,
        max_proposal_pairs=max_pairs, use_gt_box=use_gt_box,
        test_overlap=False,
    )
    fields = {}
    if scores is not None:
        fields["pred_scores"] = scores
    bl = _ref_boxlist(boxes, **fields)
    return sampler.prepare_test_pairs(torch.device("cpu"), [bl])[0].numpy()


def _our_test_pairs(boxes, scores, max_pairs=2048):
    from veto_tpu.models.relation.sampling import prepare_test_pairs

    pi, pm = prepare_test_pairs(
        jnp.ones(N_OBJ, bool), jnp.asarray(scores), jnp.asarray(boxes),
        max_pairs=max_pairs,
    )
    pi, pm = np.asarray(pi), np.asarray(pm)
    return pi[pm]


def _feed_evaluator(ev, gt, pred_boxes, pred_classes, obj_scores, pair_idx,
                    rel_scores):
    boxes, labels, gt_rels = gt
    ev.add_image(
        gt_boxes=boxes, gt_classes=labels, gt_rels=gt_rels,
        pred_boxes=pred_boxes, pred_classes=pred_classes,
        obj_scores=obj_scores, pred_rel_inds=pair_idx,
        rel_scores=rel_scores,
    )


def test_pair_enumeration_parity():
    """Reference torch.nonzero ordering == our masked top-k ordering, both
    uncapped (predcls, tie scores) and capped (score-product selection)."""
    boxes, labels, *_ = _scene(0)
    ones = np.ones(N_OBJ, np.float32)
    want = _ref_test_pairs(boxes, ones)
    got = _our_test_pairs(boxes, ones)
    np.testing.assert_array_equal(got, want)

    rng = np.random.RandomState(1)
    scores = rng.uniform(0.1, 1.0, N_OBJ).astype(np.float32)
    want = _ref_test_pairs(boxes, scores, max_pairs=7)
    got = _our_test_pairs(boxes, scores, max_pairs=7)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("mode", ["predcls", "sgcls"])
def test_gtbox_pipeline_parity(mode):
    """predcls/sgcls: reference predictor + reference PostProcessor vs the
    rebuild with imported weights + our post-processor → identical pair
    ordering, labels, scores, and metrics."""
    from test_torch_parity import _RefVetoHead, _veto_cfg  # noqa: F401
    from ref_loader import load_ref_model_veto
    from veto_tpu.evaluation.sgg_eval import SGGEvaluator
    from veto_tpu.models.relation.postprocess import postprocess_relations
    from veto_tpu.models.relation.predictor_veto import VetoPredictor
    from veto_tpu.utils.torch_import import (
        apply_updates,
        veto_relation_param_updates,
    )

    boxes, labels, gt_rels, roi, depth = _scene(2)
    pairs = _ref_test_pairs(boxes, np.ones(N_OBJ, np.float32))
    assert len(pairs) == N_OBJ * (N_OBJ - 1)

    # ---- reference stack
    ref_mod = load_ref_model_veto()
    torch.manual_seed(3)
    ref = _RefVetoHead(ref_mod).eval()
    with torch.no_grad():
        ref.pos_embed[0].running_mean.copy_(torch.randn(4) * 20)
        ref.pos_embed[0].running_var.copy_(torch.rand(4) * 50 + 1)
        ref_logits, _ = ref(
            torch.from_numpy(boxes), torch.from_numpy(labels),
            torch.from_numpy(roi), torch.from_numpy(depth),
            torch.from_numpy(pairs),
        )
    um = load_ref_utils_motifs()
    if mode == "predcls":
        # GT-logit injection (relation_head.py:104-111)
        obj_logits = um.to_onehot(torch.from_numpy(labels), NUM_OBJ).numpy()
    else:
        obj_logits = np.random.RandomState(4).randn(
            N_OBJ, NUM_OBJ).astype(np.float32) * 3

    inf = load_ref_inference()
    post = inf.PostProcessor(
        attribute_on=False, use_gt_box=True, later_nms_pred_thres=0.3,
        cfg=_post_cfg(),
    )
    with torch.no_grad():
        (ref_bl,) = post(
            (
                [ref_logits],
                [torch.from_numpy(obj_logits)],
            ),
            [torch.from_numpy(pairs)],
            [_ref_boxlist(boxes)],
        )

    # ---- rebuild stack: same weights through the name map
    ours = VetoPredictor(mode="predcls", remat=False, dtype=jnp.float32)
    args = dict(
        boxes=jnp.asarray(boxes)[None],
        box_mask=jnp.ones((1, N_OBJ), bool),
        obj_labels=jnp.asarray(labels)[None].astype(jnp.int32),
        obj_logits=jnp.zeros((1, N_OBJ, NUM_OBJ)),
        pair_idx=jnp.asarray(pairs)[None].astype(jnp.int32),
        pair_mask=jnp.ones((1, len(pairs)), bool),
        roi_features=jnp.asarray(np.transpose(roi, (0, 2, 3, 1)))[None],
        depth_features=jnp.asarray(np.transpose(depth, (0, 2, 3, 1)))[None],
    )
    variables = ours.init(jax.random.PRNGKey(0), **args, train=False)
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    updates, stats = veto_relation_param_updates(sd, src_prefix="")
    params, _, skipped = apply_updates(variables["params"], updates)
    assert not skipped
    bstats, _, s_skipped = apply_updates(
        variables.get("batch_stats", {}), stats)
    assert not s_skipped
    out = ours.apply(
        {"params": params, "batch_stats": bstats}, **args, train=False)
    our_logits = np.asarray(out.rel_logits[0])
    np.testing.assert_allclose(our_logits, ref_logits.numpy(), atol=3e-4)

    pred = jax.tree.map(
        np.asarray,
        postprocess_relations(
            jnp.asarray(our_logits), jnp.asarray(obj_logits),
            jnp.asarray(pairs).astype(jnp.int32),
            jnp.ones(len(pairs), bool),
        ),
    )

    # ---- exact post-processor parity (identical logits through both)
    pred_exact = jax.tree.map(
        np.asarray,
        postprocess_relations(
            jnp.asarray(ref_logits.numpy()), jnp.asarray(obj_logits),
            jnp.asarray(pairs).astype(jnp.int32),
            jnp.ones(len(pairs), bool),
        ),
    )
    np.testing.assert_array_equal(
        pred_exact.pair_idx, ref_bl.get_field("rel_pair_idxs").numpy())
    np.testing.assert_array_equal(
        pred_exact.rel_labels, ref_bl.get_field("pred_rel_labels").numpy())
    np.testing.assert_allclose(
        pred_exact.rel_scores, ref_bl.get_field("pred_rel_scores").numpy(),
        atol=1e-6)
    np.testing.assert_array_equal(
        pred_exact.obj_labels, ref_bl.get_field("pred_labels").numpy())
    np.testing.assert_allclose(
        pred_exact.obj_scores, ref_bl.get_field("pred_scores").numpy(),
        atol=1e-6)

    # ---- full-stack metric parity (each stack's own logits)
    gt = (boxes, labels, gt_rels)
    ev_mode = mode
    ev_ref = SGGEvaluator(mode=ev_mode, num_rel_classes=NUM_REL)
    _feed_evaluator(
        ev_ref, gt, boxes,
        ref_bl.get_field("pred_labels").numpy(),
        ref_bl.get_field("pred_scores").numpy(),
        ref_bl.get_field("rel_pair_idxs").numpy(),
        ref_bl.get_field("pred_rel_scores").numpy(),
    )
    ev_ours = SGGEvaluator(mode=ev_mode, num_rel_classes=NUM_REL)
    _feed_evaluator(
        ev_ours, gt, boxes, pred.obj_labels, pred.obj_scores,
        pred.pair_idx, pred.rel_scores,
    )
    want, got = ev_ref.aggregate(), ev_ours.aggregate()
    for metric in ("R", "ngR", "mR", "ngmR", "aR", "A"):
        for k, v in want[metric].items():
            assert got[metric][k] == pytest.approx(v, abs=1e-9), (metric, k)


def test_sgdet_pipeline_parity():
    """sgdet post-NMS path: reference PostProcessor (obj_prediction_nms +
    per-class regression pick, inference.py:409-433) vs
    postprocess_relations_sgdet on identical inputs → identical boxes,
    labels, orderings, and metrics."""
    from veto_tpu.evaluation.sgg_eval import SGGEvaluator
    from veto_tpu.models.relation.postprocess import (
        postprocess_relations_sgdet,
    )

    rng = np.random.RandomState(5)
    boxes, labels, gt_rels, _, _ = _scene(6)
    # per-class regressed boxes: base detection + class-specific jitter
    boxes_per_cls = (
        boxes[:, None, :]
        + rng.uniform(-4, 4, (N_OBJ, NUM_OBJ, 4)).astype(np.float32)
    )
    boxes_per_cls[..., 2:] = np.maximum(
        boxes_per_cls[..., 2:], boxes_per_cls[..., :2] + 1)
    obj_logits = rng.randn(N_OBJ, NUM_OBJ).astype(np.float32) * 2
    scores = rng.uniform(0.2, 1.0, N_OBJ).astype(np.float32)
    rel_logits = rng.randn(N_OBJ * (N_OBJ - 1), NUM_REL).astype(np.float32)

    pairs = _ref_test_pairs(boxes, scores, use_gt_box=False)

    inf = load_ref_inference()
    post = inf.PostProcessor(
        attribute_on=False, use_gt_box=False, later_nms_pred_thres=0.3,
        cfg=_post_cfg(),
    )
    with torch.no_grad():
        (ref_bl,) = post(
            ([torch.from_numpy(rel_logits)], [torch.from_numpy(obj_logits)]),
            [torch.from_numpy(pairs)],
            [_ref_boxlist(boxes, boxes_per_cls=boxes_per_cls)],
        )

    pred = jax.tree.map(
        np.asarray,
        postprocess_relations_sgdet(
            jnp.asarray(rel_logits), jnp.asarray(obj_logits),
            jnp.asarray(pairs).astype(jnp.int32),
            jnp.ones(len(pairs), bool),
            jnp.asarray(boxes_per_cls), jnp.ones(N_OBJ, bool),
            later_nms_thres=0.3,
        ),
    )
    np.testing.assert_array_equal(
        pred.obj_labels, ref_bl.get_field("pred_labels").numpy())
    np.testing.assert_allclose(
        pred.obj_scores, ref_bl.get_field("pred_scores").numpy(), atol=1e-6)
    np.testing.assert_allclose(pred.boxes, ref_bl.bbox.numpy(), atol=1e-5)
    np.testing.assert_array_equal(
        pred.pair_idx, ref_bl.get_field("rel_pair_idxs").numpy())
    np.testing.assert_array_equal(
        pred.rel_labels, ref_bl.get_field("pred_rel_labels").numpy())
    np.testing.assert_allclose(
        pred.rel_scores, ref_bl.get_field("pred_rel_scores").numpy(),
        atol=1e-6)

    gt = (boxes, labels, gt_rels)
    ev_ref = SGGEvaluator(mode="sgdet", num_rel_classes=NUM_REL)
    _feed_evaluator(
        ev_ref, gt, ref_bl.bbox.numpy(),
        ref_bl.get_field("pred_labels").numpy(),
        ref_bl.get_field("pred_scores").numpy(),
        ref_bl.get_field("rel_pair_idxs").numpy(),
        ref_bl.get_field("pred_rel_scores").numpy(),
    )
    ev_ours = SGGEvaluator(mode="sgdet", num_rel_classes=NUM_REL)
    _feed_evaluator(
        ev_ours, gt, pred.boxes, pred.obj_labels, pred.obj_scores,
        pred.pair_idx, pred.rel_scores,
    )
    want, got = ev_ref.aggregate(), ev_ours.aggregate()
    for metric in ("R", "ngR", "mR", "ngmR", "aR"):
        for k, v in want[metric].items():
            assert got[metric][k] == pytest.approx(v, abs=1e-9), (metric, k)
