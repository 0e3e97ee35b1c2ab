"""Sharded-vs-unsharded numerical equivalence (VERDICT r2 #1).

The DP+pair-parallel design's correctness claim is that a step jitted over
an (n, m) {data, pair} mesh computes THE SAME numbers as the single-device
step — the analog of DDP's all-reduce semantics (reference
tools/relation_train_net.py:372-380).  The round-2 suite only asserted
sharding placement and finite loss; these tests assert value equality:
loss, per-loss-term values, grad norm, and a post-update parameter
checksum must agree between a (1,1) mesh and a (4,2)/(2,4) mesh to float
tolerance.  A masked mean or psum whose value depends on the shard count
turns these red.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from veto_tpu.config.defaults import SolverConfig
from veto_tpu.data.synthetic import SyntheticSGGDataset
from veto_tpu.engine.train import (
    batch_sharding,
    create_train_state,
    make_mesh,
    make_sgdet_eval_step,
    make_sgdet_train_step,
    make_train_step,
    shard_train_step,
)
from veto_tpu.models.sgg import SGGModel
from veto_tpu.solver.optim import make_optimizer

NUM_OBJ, NUM_REL, MAX_BOXES, BATCH = 21, 11, 6, 4
PAIRS = 16


def _tiny_model(mode="predcls"):
    kw = {}
    if mode == "sgdet":
        kw = dict(detections_per_img=8, rpn_pre_nms_top_n=64,
                  rpn_post_nms_top_n=16, rpn_fpn_post_nms_top_n=16)
    return SGGModel(
        num_obj_classes=NUM_OBJ, num_rel_classes=NUM_REL, mode=mode,
        stage_blocks=(1, 1, 1, 1), groups=1, width_per_group=16,
        fpn_channels=32, dtype=jnp.float32, **kw,
    )


def _batch():
    ds = SyntheticSGGDataset(
        num_images=BATCH, image_size=(64, 64), num_obj_classes=NUM_OBJ,
        num_rel_classes=NUM_REL, max_objects=MAX_BOXES - 1, min_objects=3,
        max_relations=6, seed=0,
    )
    batch, _ = next(ds.batches(batch_size=BATCH, max_boxes=MAX_BOXES))
    return jax.tree.map(jnp.asarray, batch)


def _init(model, batch, mode="predcls"):
    rng = jax.random.PRNGKey(0)
    small = jax.tree.map(lambda x: x[:1], batch)
    pi = jnp.zeros((1, 8, 2), jnp.int32)
    pm = jnp.ones((1, 8), bool)
    if mode == "sgdet":
        variables = model.init(
            rng, small.images, small.depth, small.boxes, small.box_mask,
            small.labels, small.obj_logits, pi, pm, method="init_all",
        )
    else:
        variables = None
    scfg = SolverConfig(base_lr=1e-4, scale_lr_by_batch=False, warmup_iters=10)
    if variables is None:
        variables = {
            "params": model.init(
                rng, small.images, small.depth, small.boxes, small.box_mask,
                small.labels, small.obj_logits, pi, pm, train=False,
            )["params"]
        }
    tx = make_optimizer(scfg, variables["params"])
    state = create_train_state(model, tx, rng, small, variables=variables)
    return tx, state


def _copy(tree):
    return jax.tree.map(lambda x: jnp.array(x), tree)


def _param_checksum(params):
    leaves = jax.tree.leaves(params)
    return float(sum(jnp.sum(jnp.abs(l.astype(jnp.float64)
                                     if l.dtype == jnp.float32 else l))
                     for l in leaves))


def _run_step(make_fn, model, tx, state, batch, mesh):
    step = shard_train_step(
        make_fn(model, tx, None, batch_size_per_image=PAIRS, mesh=mesh),
        mesh,
    )
    b = jax.device_put(batch, batch_sharding(mesh))
    scale = jnp.asarray(1.0, jnp.float32)
    new_state, metrics = step(_copy(state), b, scale)
    return new_state, jax.device_get(metrics)


@pytest.mark.parametrize("sharded_mesh", [(4, 2), (2, 4)])
def test_train_step_sharded_equals_unsharded(sharded_mesh):
    model = _tiny_model("predcls")
    batch = _batch()
    tx, state = _init(model, batch)

    _, m1 = _run_step(make_train_step, model, tx, state, batch, make_mesh(1, 1))
    s8, m8 = _run_step(make_train_step, model, tx, state, batch,
                       make_mesh(*sharded_mesh))

    for k in m1:
        np.testing.assert_allclose(m8[k], m1[k], rtol=2e-5, atol=1e-6,
                                   err_msg=f"metric {k}")
    # post-update params must also match (catches a grad that was scaled by
    # the shard count instead of properly psum-reduced)
    s1, _ = _run_step(make_train_step, model, tx, state, batch, make_mesh(1, 1))
    assert _param_checksum(jax.device_get(s8.params)) == pytest.approx(
        _param_checksum(jax.device_get(s1.params)), rel=1e-6)


def test_sgdet_train_step_sharded_equals_unsharded():
    model = _tiny_model("sgdet")
    batch = _batch()
    tx, state = _init(model, batch, mode="sgdet")

    s1, m1 = _run_step(make_sgdet_train_step, model, tx, state, batch,
                       make_mesh(1, 1))
    s8, m8 = _run_step(make_sgdet_train_step, model, tx, state, batch,
                       make_mesh(4, 2))

    for k in m1:
        np.testing.assert_allclose(m8[k], m1[k], rtol=5e-5, atol=1e-6,
                                   err_msg=f"metric {k}")
    assert _param_checksum(jax.device_get(s8.params)) == pytest.approx(
        _param_checksum(jax.device_get(s1.params)), rel=1e-6)


def test_sgdet_eval_step_sharded_equals_unsharded():
    model = _tiny_model("sgdet")
    batch = _batch()
    _, state = _init(model, batch, mode="sgdet")

    outs = {}
    for name, mesh in (("single", make_mesh(1, 1)), ("mesh", make_mesh(2, 4))):
        step = make_sgdet_eval_step(model, max_pairs=PAIRS, mesh=mesh)
        jstep = jax.jit(step, in_shardings=(None, batch_sharding(mesh)))
        b = jax.device_put(batch, batch_sharding(mesh))
        outs[name] = jax.device_get(jstep(_copy(state), b))

    flat1, tree1 = jax.tree.flatten(outs["single"])
    flat8, tree8 = jax.tree.flatten(outs["mesh"])
    assert tree1 == tree8
    for a, b_ in zip(flat1, flat8):
        if np.issubdtype(a.dtype, np.floating):
            # discrete selections (labels, pair indices, masks) must match
            # exactly below; continuous leaves only to float tolerance —
            # different mesh shapes compile different fusions, so box
            # coordinates can drift by a few ulp (observed 4e-6 abs)
            np.testing.assert_allclose(b_, a, rtol=2e-4, atol=1e-4)
        else:
            np.testing.assert_array_equal(b_, a)
