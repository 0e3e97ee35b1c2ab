"""Multi-host eval gather (merge math) + pair-axis sharding proof."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from veto_tpu.engine.gather import merge_evaluators, pad_allgather
from veto_tpu.engine.train import constrain_pair_tree, make_mesh
from veto_tpu.evaluation.sgg_eval import SGGEvaluator

NUM_REL = 8


def _fake_image(rng, n_obj=6, n_gt=4, n_pred=18):
    boxes = np.sort(rng.uniform(0, 80, (n_obj, 4)), -1).astype(np.float32)
    boxes[:, 2:] += 20
    classes = rng.randint(1, 9, n_obj)
    pairs = [(i, j) for i in range(n_obj) for j in range(n_obj) if i != j]
    sel = rng.choice(len(pairs), n_gt, replace=False)
    rels = np.array([[pairs[s][0], pairs[s][1], rng.randint(1, NUM_REL)]
                     for s in sel])
    psel = rng.choice(len(pairs), n_pred, replace=False)
    pri = np.array([pairs[s] for s in psel])
    scores = rng.dirichlet(np.ones(NUM_REL), n_pred)
    return boxes, classes, rels, pri, scores


def _feed(ev, images):
    for boxes, classes, rels, pri, scores in images:
        ev.add_image(
            gt_boxes=boxes, gt_classes=classes, gt_rels=rels,
            pred_boxes=boxes, pred_classes=classes,
            obj_scores=np.ones(len(classes)), pred_rel_inds=pri,
            rel_scores=scores,
        )


def test_merged_evaluators_equal_single_evaluator():
    """Gathered per-host stats must reproduce rank-0-style global metrics
    exactly (the reference's _accumulate_predictions_from_multiple_gpus
    + single evaluator, inference.py:62-90)."""
    rng = np.random.RandomState(5)
    images = [_fake_image(rng) for _ in range(7)]

    whole = SGGEvaluator(mode="predcls", num_rel_classes=NUM_REL,
                         zeroshot_triplets=np.array([[1, 2, 3]]))
    _feed(whole, images)

    # two "hosts" with an uneven split
    host0 = SGGEvaluator(mode="predcls", num_rel_classes=NUM_REL,
                         zeroshot_triplets=np.array([[1, 2, 3]]))
    host1 = SGGEvaluator(mode="predcls", num_rel_classes=NUM_REL,
                         zeroshot_triplets=np.array([[1, 2, 3]]))
    _feed(host0, images[:3])
    _feed(host1, images[3:])

    merged = SGGEvaluator(mode="predcls", num_rel_classes=NUM_REL)
    merge_evaluators(merged, [host0, host1])

    want, got = whole.aggregate(), merged.aggregate()
    assert merged.num_images == whole.num_images
    for metric in ("R", "ngR", "zR", "mR", "ngmR", "A"):
        for k, v in want[metric].items():
            assert got[metric][k] == pytest.approx(v, abs=1e-12), (metric, k)
    np.testing.assert_allclose(
        got["mR_per_class"][100], want["mR_per_class"][100])


def test_pad_allgather_single_process():
    out = pad_allgather(np.array([1.0, 2.5, 3.0]))
    assert len(out) == 1
    np.testing.assert_array_equal(out[0], [1.0, 2.5, 3.0])


def test_pair_axis_actually_partitioned():
    """constrain_pair_tree must force a ('data','pair') layout — the test is
    red if the constraint silently drops and XLA replicates (VERDICT #10)."""
    mesh = make_mesh(data=2, pair=4)
    b, p = 2, 64
    pair_idx = jnp.zeros((b, p, 2), jnp.int32)
    pair_mask = jnp.ones((b, p), bool)

    @jax.jit
    def f(t):
        pi, pm = constrain_pair_tree(t, mesh, ref_shape=(b, p))
        return pi * 2, pm

    with mesh:
        pi, pm = f((pair_idx, pair_mask))
    want = NamedSharding(mesh, P("data", "pair"))
    assert pi.sharding.is_equivalent_to(want, pi.ndim), pi.sharding
    assert pm.sharding.is_equivalent_to(want, pm.ndim), pm.sharding
    # each device holds exactly (b/2, p/4) rows — i.e. truly partitioned
    shard_shapes = {s.data.shape for s in pi.addressable_shards}
    assert shard_shapes == {(b // 2, p // 4, 2)}, shard_shapes


def test_train_step_pair_tensors_partitioned():
    """End-to-end: inside a (2,4)-mesh train step the sampled pair tensors
    carry the pair-axis sharding (checked via the jitted sampler+constraint
    composition used by make_train_step)."""
    from veto_tpu.models.relation.sampling import gtbox_relsample

    mesh = make_mesh(data=2, pair=4)
    b, n, pairs = 2, 8, 32
    rng = np.random.RandomState(0)
    rel = jnp.asarray(rng.randint(0, 3, (b, n, n)))
    mask = jnp.ones((b, n), bool)

    @jax.jit
    def sample(keys):
        s = jax.vmap(
            lambda k, r, m: gtbox_relsample(k, r, m, batch_size=pairs)
        )(keys, rel, mask)
        return constrain_pair_tree(s, mesh)

    with mesh:
        out = sample(jax.random.split(jax.random.PRNGKey(0), b))
    want = NamedSharding(mesh, P("data", "pair"))
    assert out.pair_idx.sharding.is_equivalent_to(want, out.pair_idx.ndim)
    assert out.labels.sharding.is_equivalent_to(want, out.labels.ndim)
    shard_shapes = {s.data.shape for s in out.labels.addressable_shards}
    assert shard_shapes == {(b // 2, pairs // 4)}, shard_shapes
