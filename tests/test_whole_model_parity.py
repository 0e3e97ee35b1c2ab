"""Whole-model forward parity vs the LIVE reference (VERDICT r4 #1).

The one test that exercises the weight importer + every module + every
wiring convention in a single assertion: build the reference's actual
`build_detection_model(cfg)` → `GeneralizedRCNN` (generalized_rcnn.py:
36-76) with seeded random init, run it eval-mode on a fixed synthetic
image (tests/ref_full_model.py, in a subprocess — the real pysgg package
import would collide with ref_loader's partial stubs), import that same
state_dict through `utils/torch_import.py`, run the rebuild's `SGGModel`
on the same image, and assert final field-level agreement: pred boxes /
labels / scores, rel_pair_idxs, pred_rel_scores / labels — for predcls
AND sgdet.

The reference side runs its OWN kernels: pysgg._C is the reference's CPU
csrc compiled by tests/ref_cpu_ops.py, so ROIAlign/NMS parity here is
against the genuine implementation, not a transcription.
"""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_loader import reference_available

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not reference_available(), reason="/root/reference not mounted"
    ),
]

HERE = os.path.dirname(os.path.abspath(__file__))
CACHE_VERSION = "v1"  # bump to invalidate cached reference runs


def _reference_run(mode):
    """Run tests/ref_full_model.py in a subprocess (cached on disk)."""
    out = f"/tmp/ref_whole_{mode}_{CACHE_VERSION}.pkl"
    if not os.path.exists(out):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)  # torch-only subprocess
        subprocess.run(
            [sys.executable, os.path.join(HERE, "ref_full_model.py"),
             "--mode", mode, "--out", out],
            check=True, timeout=2400, env=env,
            cwd=os.path.dirname(HERE),
        )
    with open(out, "rb") as fh:
        return pickle.load(fh)


def _flagship_model(mode):
    from veto_tpu.models.sgg import SGGModel

    return SGGModel(
        mode=mode,
        dtype=jnp.float32,
        veto_remat=False,
        veto_encoder_impl="xla",
        pooler_impl="separable",
    )


def _import_all_weights(variables, sd):
    from veto_tpu.utils.torch_import import (
        apply_updates,
        depth_backbone_param_updates,
        detector_param_updates,
        veto_relation_param_updates,
    )

    det = detector_param_updates(sd)
    dep, dep_stats = depth_backbone_param_updates(sd)
    rel, rel_stats = veto_relation_param_updates(sd)
    rel = {("relation",) + p: a for p, a in rel.items()}
    rel_stats = {("relation",) + p: a for p, a in rel_stats.items()}

    params, loaded, skipped = apply_updates(
        variables["params"], {**det, **dep, **rel})
    assert not skipped, skipped[:8]
    stats, _, s_skipped = apply_updates(
        variables.get("batch_stats", {}), {**dep_stats, **rel_stats})
    assert not s_skipped, s_skipped[:8]
    return {"params": params, "batch_stats": stats}


def _make_batch(raw, num_obj, max_boxes=None):
    from veto_tpu.engine.batch import SGGBatch

    img = np.transpose(raw["image"], (0, 2, 3, 1))  # NCHW → NHWC
    depth = np.transpose(raw["depth"], (0, 2, 3, 1))
    n = raw["boxes"].shape[0]
    m = max_boxes or n
    boxes = np.zeros((1, m, 4), np.float32)
    boxes[0, :n] = raw["boxes"]
    labels = np.zeros((1, m), np.int32)
    labels[0, :n] = raw["labels"]
    mask = np.zeros((1, m), bool)
    mask[0, :n] = True
    return SGGBatch(
        images=jnp.asarray(img),
        depth=jnp.asarray(depth),
        boxes=jnp.asarray(boxes),
        box_mask=jnp.asarray(mask),
        labels=jnp.asarray(labels),
        obj_logits=jnp.zeros((1, m, num_obj), jnp.float32),
        rel_matrix=jnp.zeros((1, m, m), jnp.int32),
        sizes=jnp.asarray([[raw["width"], raw["height"]]], jnp.int32),
    )


def _init_variables(model, batch):
    """Full param tree via init_all on a TINY dummy image — every param
    shape is image-size independent, and tracing the detect cascade at the
    real resolution costs minutes of eager CPU."""
    pair_idx = jnp.zeros((1, 4, 2), jnp.int32)
    pair_mask = jnp.ones((1, 4), bool)
    # 256x256: small enough to trace fast, large enough that the anchor
    # counts still exceed the 6000/1000 RPN budgets
    img = jnp.zeros((1, 256, 256, 3), jnp.float32)
    dep = jnp.zeros((1, 256, 256, 1), jnp.float32)
    n = batch.boxes.shape[1]
    boxes = jnp.tile(jnp.asarray([[0.0, 0.0, 16.0, 16.0]]), (n, 1))[None]
    return model.init(
        jax.random.PRNGKey(0), img, dep, boxes,
        batch.box_mask, batch.labels, batch.obj_logits, pair_idx, pair_mask,
        method="init_all",
    )


from typing import Any, NamedTuple


class _StateTuple(NamedTuple):
    """Duck-typed TrainState carrier for the eval steps (a pytree so the
    steps can be jitted)."""

    params: Any
    batch_stats: Any


def _State(variables):
    return _StateTuple(variables["params"],
                       variables.get("batch_stats", {}))


def test_whole_model_predcls_parity():
    ref = _reference_run("predcls")
    fields, sd, raw = ref["fields"], ref["state_dict"], ref["raw"]
    n = raw["boxes"].shape[0]
    n_pairs = n * (n - 1)

    from veto_tpu.engine.train import make_eval_step

    model = _flagship_model("predcls")
    batch = _make_batch(raw, num_obj=151)
    variables = _init_variables(model, batch)
    variables = _import_all_weights(variables, sd)

    step = jax.jit(make_eval_step(model, max_pairs=n_pairs))
    pred = jax.tree.map(np.asarray, step(_State(variables), batch))
    # single image in the batch
    pred = jax.tree.map(lambda x: x[0], pred)

    np.testing.assert_array_equal(
        pred.pair_idx, fields["rel_pair_idxs"])
    np.testing.assert_array_equal(
        pred.rel_labels, fields["pred_rel_labels"])
    np.testing.assert_allclose(
        pred.rel_scores, fields["pred_rel_scores"], atol=2e-4)
    np.testing.assert_array_equal(pred.obj_labels, fields["pred_labels"])
    np.testing.assert_allclose(
        pred.obj_scores, fields["pred_scores"], atol=1e-5)


def test_whole_model_sgdet_parity():
    ref = _reference_run("sgdet")
    fields, sd, raw = ref["fields"], ref["state_dict"], ref["raw"]

    from veto_tpu.engine.train import make_sgdet_eval_step

    model = _flagship_model("sgdet")
    batch = _make_batch(raw, num_obj=151)
    variables = _init_variables(model, batch)
    variables = _import_all_weights(variables, sd)

    step = jax.jit(make_sgdet_eval_step(model, max_pairs=2048,
                                        later_nms_thres=0.5))
    pred = jax.tree.map(np.asarray, step(_State(variables), batch))
    pred = jax.tree.map(lambda x: x[0], pred)

    np.testing.assert_allclose(pred.boxes, fields["boxes"], atol=1e-2)
    np.testing.assert_array_equal(pred.obj_labels, fields["pred_labels"])
    np.testing.assert_allclose(
        pred.obj_scores, fields["pred_scores"], atol=1e-4)
    np.testing.assert_array_equal(
        pred.pair_idx, fields["rel_pair_idxs"])
    np.testing.assert_array_equal(
        pred.rel_labels, fields["pred_rel_labels"])
    np.testing.assert_allclose(
        pred.rel_scores, fields["pred_rel_scores"], atol=2e-4)
