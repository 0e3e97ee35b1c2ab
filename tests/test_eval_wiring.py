"""Eval completeness wiring: zR in the tools' evaluator, reference
zeroshot binary loading, longtail parts plumbing."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

REF_ZS = (
    "/root/reference/pysgg/data/datasets/evaluation/vg/zeroshot_triplet.pytorch"
)


@pytest.mark.skipif(not os.path.exists(REF_ZS), reason="reference binary absent")
def test_reference_zeroshot_binary_loads_and_fires():
    """The shipped zeroshot_triplet.pytorch loads with the installed torch
    and drives zR in our evaluator (reference SGZeroShotRecall
    sgg_eval.py:261-318 consumes exactly this tensor)."""
    from veto_tpu.evaluation.sgg_eval import (
        SGGEvaluator,
        load_zeroshot_triplets_file,
    )

    zs = load_zeroshot_triplets_file(REF_ZS)
    assert zs.ndim == 2 and zs.shape[1] == 3 and len(zs) > 100
    assert zs[:, 0].min() >= 1 and zs[:, 0].max() <= 150  # subject class
    assert zs[:, 1].min() >= 1 and zs[:, 1].max() <= 150  # object class
    assert zs[:, 2].min() >= 1 and zs[:, 2].max() <= 50   # predicate

    # craft a GT image containing the first zero-shot triple and a perfect
    # prediction for it → zR@K must be 1
    s_cls, o_cls, pred = zs[0]
    gt_boxes = np.array([[0, 0, 30, 30], [50, 50, 90, 90]], np.float32)
    gt_classes = np.array([s_cls, o_cls])
    gt_rels = np.array([[0, 1, pred]])
    rel_scores = np.full((1, 51), 1e-3)
    rel_scores[0, pred] = 0.9
    ev = SGGEvaluator(mode="predcls", num_rel_classes=51,
                      zeroshot_triplets=zs)
    ev.add_image(
        gt_boxes=gt_boxes, gt_classes=gt_classes, gt_rels=gt_rels,
        pred_boxes=gt_boxes, pred_classes=gt_classes,
        obj_scores=np.ones(2), pred_rel_inds=np.array([[0, 1]]),
        rel_scores=rel_scores,
    )
    agg = ev.aggregate()
    assert agg["zR"][20] == 1.0


class _FakeDs:
    """Minimal dataset for compute_zeroshot_triplets."""

    def __init__(self, triplets):
        # one image per triplet, two objects each
        self.img_info = [{} for _ in triplets]
        self.gt_classes = [np.array([s, o]) for s, o, _ in triplets]
        self.relationships = [np.array([[0, 1, p]]) for _, _, p in triplets]


def test_make_sgg_evaluator_wires_everything(tmp_path):
    from relation_train_net import make_sgg_evaluator
    from veto_tpu.config.defaults import Config
    from veto_tpu.evaluation.sgg_eval import vg_longtail_parts

    cfg = Config()
    cfg.output_dir = str(tmp_path)
    cfg.test.stagewise_eval = True

    train = _FakeDs([(1, 2, 3), (4, 5, 6)])
    test = _FakeDs([(1, 2, 3), (7, 8, 9), (4, 5, 10)])
    ev = make_sgg_evaluator(cfg, train, test)

    # unseen = test minus train
    np.testing.assert_array_equal(
        ev.zeroshot_triplets, [[4, 5, 10], [7, 8, 9]])
    # cache written and reused
    assert os.path.exists(tmp_path / "zeroshot_triplets.npy")
    ev2 = make_sgg_evaluator(cfg, train, test)
    np.testing.assert_array_equal(ev2.zeroshot_triplets, ev.zeroshot_triplets)
    # VG-51 longtail parts attached, permuted for freq reorder
    assert ev.longtail_parts == vg_longtail_parts(reordered=True)
    assert ev.stagewise is not None

    cfg2 = Config()
    cfg2.output_dir = str(tmp_path / "b")
    cfg2.test.zeroshot_eval = False
    cfg2.test.longtail_eval = False
    ev3 = make_sgg_evaluator(cfg2, train, test)
    assert ev3.zeroshot_triplets is None
    assert ev3.longtail_parts is None
    assert ev3.stagewise is None


def test_relness_rides_eval_path_into_stagewise():
    """relness on RelPrediction reaches the stagewise rel-PN diagnostics
    through accumulate_eval (postprocess reorders it with the pairs)."""
    import jax
    import jax.numpy as jnp
    from relation_train_net import accumulate_eval
    from veto_tpu.evaluation.sgg_eval import SGGEvaluator
    from veto_tpu.models.relation.postprocess import postprocess_relations

    rng = np.random.RandomState(0)
    n, p, c = 4, 6, 8
    pair_idx = np.array([[0, 1], [1, 0], [0, 2], [2, 0], [1, 2], [2, 1]])
    relness = rng.uniform(size=(p,)).astype(np.float32)
    pred = postprocess_relations(
        jnp.asarray(rng.randn(p, c), jnp.float32),
        jnp.asarray(rng.randn(n, 5), jnp.float32),
        jnp.asarray(pair_idx), jnp.ones((p,), bool),
        jnp.asarray(relness),
    )
    # reordered with the triple-score sort, not dropped
    assert pred.relness is not None
    assert sorted(np.asarray(pred.relness).tolist()) == sorted(relness.tolist())

    ev = SGGEvaluator(mode="sgcls", num_rel_classes=c, stagewise=True)
    batched = jax.tree_util.tree_map(lambda x: np.asarray(x)[None], pred)
    boxes = np.array([[0, 0, 30, 30], [40, 40, 70, 70], [10, 50, 40, 80],
                      [60, 0, 90, 30]], np.float32)
    rec = {"boxes": boxes, "labels": np.array([1, 2, 3, 4]),
           "rel_tuples": np.array([[0, 1, 3], [2, 0, 5]])}
    accumulate_eval("predcls", batched, [rec], ev)
    assert ev.stagewise.rel_pn  # AP entries recorded
    assert any(k.startswith("ap-iter0") for k in ev.stagewise.rel_pn)


def test_vg_longtail_parts_reorder_permutation():
    from veto_tpu.data.predicate_stats import VG_PREDICATE_NEW_ORDER
    from veto_tpu.evaluation.sgg_eval import (
        VG_LONGTAIL_PART_DICT,
        vg_longtail_parts,
    )

    parts = vg_longtail_parts(reordered=True)
    for old_id in range(51):
        assert parts[VG_PREDICATE_NEW_ORDER[old_id]] == VG_LONGTAIL_PART_DICT[old_id]
    assert vg_longtail_parts(reordered=False) == list(VG_LONGTAIL_PART_DICT)
