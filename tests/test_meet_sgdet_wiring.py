"""MEET sgdet eval plumbing (VERDICT r2 weak #3 / directive #4).

Round 2's `make_eval_fn` MEET branch silently dropped `require_overlap`
and `mesh`.  These tests pin the fix at both levels:
  * unit — the overlap filter actually fires inside
    `make_meet_eval_step(mode='sgdet', require_overlap=True)`;
  * wiring — `make_eval_fn` forwards `cfg.test.relation_require_overlap`
    and the mesh into the MEET branch (reference semantics:
    REQUIRE_BOX_OVERLAP reaches RelationSampling.prepare_test_pairs,
    pysgg/modeling/roi_heads/relation_head/sampling.py:31-52).
"""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from test_meet import GROUPS, NUM_OBJ, NUM_REL, tiny_meet_cfg  # noqa: E402

MAX_BOXES = 6
IMG = (64, 64)


def _sgdet_meet_model():
    from veto_tpu.models.sgg import SGGModel

    return SGGModel(
        num_obj_classes=NUM_OBJ, num_rel_classes=NUM_REL, mode="sgdet",
        stage_blocks=(1, 1, 1, 1), groups=1, width_per_group=16,
        fpn_channels=32, meet_group_sizes=GROUPS, meet_experts=1,
        detections_per_img=8, rpn_pre_nms_top_n=64, rpn_post_nms_top_n=16,
        rpn_fpn_post_nms_top_n=16, dtype=jnp.float32,
    )


def test_meet_sgdet_overlap_filter_fires():
    from veto_tpu.data.synthetic import SyntheticSGGDataset
    from veto_tpu.engine.train import make_meet_eval_step

    model = _sgdet_meet_model()
    ds = SyntheticSGGDataset(
        num_images=2, image_size=IMG, num_obj_classes=NUM_OBJ,
        num_rel_classes=NUM_REL, max_objects=MAX_BOXES - 2, min_objects=3,
        max_relations=4, seed=3,
    )
    batch, _ = next(ds.batches(batch_size=2, max_boxes=MAX_BOXES))
    batch = jax.tree.map(jnp.asarray, batch)
    rng = jax.random.PRNGKey(0)
    small = jax.tree.map(lambda x: x[:1], batch)
    pi = jnp.zeros((1, 8, 2), jnp.int32)
    variables = model.init(
        rng, small.images, small.depth, small.boxes, small.box_mask,
        small.labels, small.obj_logits, pi, jnp.ones((1, 8), bool),
        method="init_all",
    )

    from veto_tpu.engine.train import TrainState

    state = TrainState(
        step=jnp.asarray(0, jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), opt_state=None,
        rng=rng,
    )

    cfg = tiny_meet_cfg(experts=1)
    counts = {}
    for flag in (False, True):
        step = jax.jit(make_meet_eval_step(
            model, cfg, max_pairs=64, mode="sgdet", require_overlap=flag,
        ))
        preds, _boxes, _mask = jax.device_get(step(state, batch))
        counts[flag] = int(preds.pair_mask.sum())
    # the filter can only remove candidate pairs — and with an untrained
    # detector's scattered boxes it must remove at least one
    assert counts[True] < counts[False], counts


def test_make_eval_fn_meet_branch_forwards_overlap_and_mesh(monkeypatch):
    import relation_train_net as rtn

    from veto_tpu.config.defaults import load_config
    from veto_tpu.engine.train import make_mesh

    cfg = load_config(None, [
        "ensemble.enabled=true", "relation.use_gt_box=false",
        "relation.use_gt_object_label=false",
        "test.relation_require_overlap=true",
    ])
    assert cfg.relation.mode == "sgdet"
    captured = {}

    def fake_meet_eval_step(model, meet, **kw):
        captured.update(kw)
        return lambda state, batch: None

    import veto_tpu.engine.train as train_mod

    monkeypatch.setattr(train_mod, "make_meet_eval_step", fake_meet_eval_step)
    mesh = make_mesh(data=2, pair=4)
    step, kind = rtn.make_eval_fn(cfg, model=None, mesh=mesh)
    assert kind == "meet"
    assert captured["require_overlap"] is True
    assert captured["mesh"] is mesh
    assert captured["mode"] == "sgdet"
