"""Detector pretraining losses: matcher, balanced sampler, RPN/box losses."""

import jax
import jax.numpy as jnp
import numpy as np

from veto_tpu.models.detector.losses import (
    BELOW_LOW,
    BETWEEN,
    balanced_sample,
    fastrcnn_losses,
    fastrcnn_sample,
    match_boxes,
    rpn_losses,
    smooth_l1,
)


def test_smooth_l1_values():
    x = jnp.asarray([0.0, 0.05, 0.5, 2.0])
    got = np.asarray(smooth_l1(x, beta=1.0 / 9))
    b = 1.0 / 9
    want = np.asarray([0.0, 0.5 * 0.05 ** 2 / b, 0.5 - 0.5 * b, 2.0 - 0.5 * b])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_match_boxes_thresholds_and_low_quality():
    gt = jnp.asarray([[0, 0, 10, 10], [100, 100, 120, 120]], jnp.float32)
    gm = jnp.asarray([True, True])
    cand = jnp.asarray(
        [
            [0, 0, 10, 10],       # iou 1.0 with gt0 → match 0
            [0, 0, 10, 22],       # iou ~0.48 with gt0 → between (0.3, 0.7)
            [300, 300, 310, 310],  # iou 0 → below
            [104, 104, 125, 125],  # best available match for gt1 (iou < 0.7)
        ],
        jnp.float32,
    )
    cm = jnp.ones((4,), bool)
    m = np.asarray(match_boxes(cand, cm, gt, gm, 0.7, 0.3, allow_low_quality=False))
    assert m[0] == 0 and m[1] == BETWEEN and m[2] == BELOW_LOW
    # candidate 3 has iou ~0.55 with gt1 → between without low-quality
    assert m[3] == BETWEEN
    m2 = np.asarray(match_boxes(cand, cm, gt, gm, 0.7, 0.3, allow_low_quality=True))
    # low-quality: candidate 3 is gt1's best match → restored to 1
    assert m2[3] == 1 and m2[0] == 0


def test_balanced_sample_budgets():
    labels = jnp.asarray([1] * 3 + [0] * 20 + [-1] * 5)
    pos, neg = balanced_sample(jax.random.PRNGKey(0), labels, 16, 0.5)
    pos, neg = np.asarray(pos), np.asarray(neg)
    assert pos.sum() == 3  # only 3 positives available (< 8 budget)
    assert neg.sum() == 13  # fills the rest
    assert not (pos & (np.asarray(labels) != 1)).any()
    assert not (neg & (np.asarray(labels) != 0)).any()


def test_rpn_losses_finite_and_positive():
    rng = np.random.RandomState(0)
    a = 200
    anchors = np.sort(rng.uniform(0, 200, (a, 2, 2)), axis=1).reshape(a, 4)
    anchors[:, 2:] += 12
    gt = jnp.asarray([[10, 10, 60, 60], [100, 100, 160, 150]], jnp.float32)
    out = rpn_losses(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.randn(a).astype(np.float32)),
        jnp.asarray(rng.randn(a, 4).astype(np.float32) * 0.1),
        jnp.asarray(anchors.astype(np.float32)),
        jnp.ones((a,), bool),
        gt, jnp.asarray([True, True]),
        batch_size=64,
    )
    assert np.isfinite(float(out.objectness)) and float(out.objectness) > 0
    assert np.isfinite(float(out.box))


def test_fastrcnn_sample_and_losses():
    rng = np.random.RandomState(1)
    p = 64
    gt = jnp.asarray([[10, 10, 60, 60], [100, 100, 160, 150]], jnp.float32)
    gl = jnp.asarray([3, 7])
    gm = jnp.asarray([True, True])
    props = np.concatenate(
        [np.asarray(gt) + rng.uniform(-2, 2, (2, 4)).astype(np.float32),
         np.sort(rng.uniform(0, 200, (p - 2, 2, 2)), axis=1).reshape(p - 2, 4)]
    ).astype(np.float32)
    props[:, 2:] += 10
    sample = fastrcnn_sample(
        jax.random.PRNGKey(0), jnp.asarray(props), jnp.ones((p,), bool),
        gt, gl, gm, batch_size=32, positive_fraction=0.25,
    )
    m = np.asarray(sample.mask)
    labs = np.asarray(sample.labels)
    assert m.sum() > 0
    assert set(labs[m]) <= {0, 3, 7}
    assert (labs[m & (labs > 0)] > 0).sum() <= 8  # 32 * 0.25 cap
    # losses finite
    s = sample.mask.shape[0]
    logits = jnp.asarray(rng.randn(s, 11).astype(np.float32))
    deltas = jnp.asarray(rng.randn(s, 44).astype(np.float32) * 0.1)
    out = fastrcnn_losses(logits, deltas, sample)
    assert np.isfinite(float(out.classifier)) and float(out.classifier) > 0
    assert np.isfinite(float(out.box_reg))
