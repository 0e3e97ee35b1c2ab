"""VCTree: tree construction semantics, TreeLSTM coverage, predictor smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from veto_tpu.models.relation.legacy.vctree import (
    TreeLSTMFwd,
    VCTreePredictor,
    build_vctree,
    overlap_info,
)

NUM_OBJ, NUM_REL = 11, 7
B, N, P, D = 2, 6, 10, 64


def test_build_vctree_matches_reference_greedy():
    """Reference gen_tree (utils_vctree.py:54-89): root = max mean score;
    greedy best (tree, outside) edge; left-child/right-sibling encoding."""
    scores = jnp.asarray(
        [
            [0.0, 0.9, 0.1, 0.2],
            [0.9, 0.0, 0.8, 0.1],
            [0.1, 0.8, 0.0, 0.7],
            [0.2, 0.1, 0.7, 0.0],
        ]
    )
    f = build_vctree(scores, jnp.ones((4,), bool))
    assert int(f.root) == 1
    # attach order: (1→0), (1→2), (2→3); arb children of 1 = [0, 2]
    assert int(f.left[1]) == 0        # first child → left
    assert int(f.right[0]) == 2       # second child → sibling's right
    assert int(f.left[2]) == 3
    np.testing.assert_array_equal(np.asarray(f.parent), [1, -1, 0, 2])
    assert np.asarray(f.in_tree).all()


def test_build_vctree_padding():
    scores = jnp.ones((5, 5))
    mask = jnp.asarray([True, True, True, False, False])
    f = build_vctree(scores, mask)
    assert not np.asarray(f.in_tree)[3:].any()
    assert np.asarray(f.parent)[3:].max() == -1
    # all valid nodes except root have a parent
    p = np.asarray(f.parent)[:3]
    assert (p >= 0).sum() == 2


def test_treelstm_covers_all_nodes():
    """Every valid node must receive a hidden state (rounds converge)."""
    n, din, h = 8, 12, 16
    rng = np.random.RandomState(0)
    # chain tree (worst-case depth): 0→1→2→...→7 via left children
    left = np.full(n, -1, np.int32)
    right = np.full(n, -1, np.int32)
    parent = np.full(n, -1, np.int32)
    for i in range(n - 1):
        left[i] = i + 1
        parent[i + 1] = i
    from veto_tpu.models.relation.legacy.vctree import BinaryForest

    forest = BinaryForest(
        left=jnp.asarray(left), right=jnp.asarray(right),
        parent=jnp.asarray(parent), root=jnp.asarray(0, jnp.int32),
        in_tree=jnp.ones((n,), bool),
    )
    feats = jnp.asarray(rng.randn(n, din).astype(np.float32))
    m = TreeLSTMFwd(din, h)
    variables = m.init(jax.random.PRNGKey(0), feats, forest)
    out = np.asarray(m.apply(variables, feats, forest))
    assert np.isfinite(out).all()
    assert (np.abs(out).sum(-1) > 0).all()  # every node fired


def test_overlap_info_shape():
    boxes = jnp.asarray([[0, 0, 10, 10], [5, 5, 20, 20], [100, 100, 110, 110]],
                        jnp.float32)
    info = np.asarray(overlap_info(boxes, jnp.ones((3,), bool)))
    assert info.shape == (3, 6)
    assert info[0, 0] == 2  # box 0 intersects itself and box 1
    assert info[2, 0] == 1  # box 2 only itself


def test_vctree_sggmodel_integration():
    from veto_tpu.config.defaults import SolverConfig
    from veto_tpu.data.synthetic import SyntheticSGGDataset
    from veto_tpu.engine.train import create_train_state, make_train_step
    from veto_tpu.models.sgg import SGGModel
    from veto_tpu.solver.optim import make_optimizer

    model = SGGModel(
        num_obj_classes=NUM_OBJ, num_rel_classes=NUM_REL, mode="predcls",
        predictor="VCTreePredictor", stage_blocks=(1, 1, 1, 1), groups=1,
        width_per_group=16, fpn_channels=32, context_hidden_dim=32,
        context_pooling_dim=64, dtype=jnp.float32,
    )
    ds = SyntheticSGGDataset(
        num_images=2, image_size=(64, 64), num_obj_classes=NUM_OBJ,
        num_rel_classes=NUM_REL, max_objects=4, min_objects=3, seed=5,
    )
    batch, _ = next(ds.batches(batch_size=2, max_boxes=N))
    batch = jax.tree.map(jnp.asarray, batch)
    small = jax.tree.map(lambda x: x[:1], batch)
    scfg = SolverConfig(base_lr=1e-3, ims_per_batch=2, scale_lr_by_batch=False,
                        warmup_iters=0)
    rng = jax.random.PRNGKey(0)
    pi = jnp.zeros((1, 8, 2), jnp.int32)
    params = model.init(
        rng, small.images, small.depth, small.boxes, small.box_mask,
        small.labels, small.obj_logits, pi, jnp.ones((1, 8), bool), train=False,
    )["params"]
    tx = make_optimizer(scfg, params)
    state = create_train_state(model, tx, rng, small)
    step = jax.jit(make_train_step(model, tx, None, batch_size_per_image=16))
    state, metrics = step(state, batch, jnp.asarray(1.0))
    assert np.isfinite(float(metrics["rel_loss"]))
    assert np.isfinite(float(metrics["binary_loss"]))
