"""NMS kernel tests, anchored to the caffe2 golden vectors the reference's
tests/test_nms.py uses (UtilsNMSTest.TestNMS in
caffe2/operators/generate_proposals_op_util_nms_test.cc)."""

import jax.numpy as jnp
import numpy as np

from veto_tpu.ops.nms import batched_nms, nms

CAFFE2_BOXES = np.array(
    [
        [10, 10, 50, 60],
        [11, 12, 48, 60],
        [8, 9, 40, 50],
        [100, 100, 150, 140],
        [99, 110, 155, 139],
    ],
    dtype=np.float32,
)
CAFFE2_SCORES = np.array([0.5, 0.7, 0.6, 0.9, 0.8], dtype=np.float32)


def _keep(boxes, scores, thresh, max_out=16, valid=None):
    idx, ok = nms(jnp.asarray(boxes), jnp.asarray(scores), thresh, max_out, valid)
    return np.sort(np.asarray(idx)[np.asarray(ok)])


def test_caffe2_golden_cases():
    expected = {
        0.1: [1, 3],
        0.3: [1, 3],
        0.5: [1, 3],
        0.8: [1, 2, 3, 4],
        0.9: [0, 1, 2, 3, 4],
    }
    for thresh, gt in expected.items():
        np.testing.assert_array_equal(_keep(CAFFE2_BOXES, CAFFE2_SCORES, thresh), gt)


def test_keep_order_is_score_descending():
    idx, ok = nms(jnp.asarray(CAFFE2_BOXES), jnp.asarray(CAFFE2_SCORES), 0.9, 8)
    kept = np.asarray(idx)[np.asarray(ok)]
    np.testing.assert_array_equal(kept, [3, 4, 1, 2, 0])  # by score desc


def test_valid_mask_excludes_padding():
    valid = jnp.array([True, True, True, False, False])
    got = _keep(CAFFE2_BOXES, CAFFE2_SCORES, 0.9, valid=valid)
    np.testing.assert_array_equal(got, [0, 1, 2])


def test_max_outputs_truncates():
    idx, ok = nms(jnp.asarray(CAFFE2_BOXES), jnp.asarray(CAFFE2_SCORES), 0.9, 2)
    assert np.asarray(ok).sum() == 2
    np.testing.assert_array_equal(np.asarray(idx), [3, 4])


def test_greedy_matches_naive_reference(rng):
    """Randomized check vs a direct O(N^2) python greedy NMS."""
    n = 64
    xy = rng.uniform(0, 80, (n, 2)).astype(np.float32)
    wh = rng.uniform(5, 40, (n, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], axis=1)
    scores = rng.uniform(0, 1, (n,)).astype(np.float32)

    def iou(a, b):
        area = lambda z: (z[2] - z[0] + 1) * (z[3] - z[1] + 1)
        lt = np.maximum(a[:2], b[:2])
        rb = np.minimum(a[2:], b[2:])
        wh_ = np.clip(rb - lt + 1, 0, None)
        inter = wh_[0] * wh_[1]
        return inter / (area(a) + area(b) - inter)

    order = np.argsort(-scores)
    keep, suppressed = [], np.zeros(n, bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if not suppressed[j] and iou(boxes[i], boxes[j]) > 0.5 and j != i:
                suppressed[j] = True

    idx, ok = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, n)
    got = list(np.asarray(idx)[np.asarray(ok)])
    assert got == keep


def test_batched_nms_classes_do_not_interact():
    boxes = np.tile(CAFFE2_BOXES[:2], (2, 1))  # same two boxes, two classes
    scores = np.array([0.5, 0.7, 0.5, 0.7], np.float32)
    idxs = jnp.array([0, 0, 1, 1])
    idx, ok = batched_nms(jnp.asarray(boxes), jnp.asarray(scores), idxs, 0.3, 8)
    kept = np.sort(np.asarray(idx)[np.asarray(ok)])
    np.testing.assert_array_equal(kept, [1, 3])  # best of each class survives


def test_blockwise_matches_sequential(rng):
    """The blockwise production nms must reproduce the select-argmax
    reference bit-exactly: clustered boxes force deep suppression chains
    (the fixpoint iteration's worst case), odd N exercises block padding,
    and small max_outputs exercises the kept-buffer budget cut."""
    from veto_tpu.ops.nms import nms_sequential

    for trial, (n, block, max_out, thresh) in enumerate([
        (64, 16, 64, 0.5),
        (200, 64, 50, 0.3),    # budget smaller than keep count
        (333, 128, 300, 0.7),  # n not a multiple of block
        (500, 512, 100, 0.5),  # single block larger than n
        (150, 1, 150, 0.4),    # degenerate block=1 (pure sequential blocks)
    ]):
        # clustered boxes -> long chains: A sup B sup C sup D ...
        centers = rng.uniform(0, 60, (n // 8 + 1, 2))
        idx = rng.randint(0, len(centers), n)
        xy = centers[idx] + rng.uniform(-6, 6, (n, 2))
        wh = rng.uniform(8, 30, (n, 2))
        boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
        scores = rng.uniform(0, 1, (n,)).astype(np.float32)
        valid = rng.uniform(0, 1, n) > 0.1

        ref_i, ref_ok = nms_sequential(
            jnp.asarray(boxes), jnp.asarray(scores), thresh, max_out,
            jnp.asarray(valid))
        got_i, got_ok = nms(
            jnp.asarray(boxes), jnp.asarray(scores), thresh, max_out,
            jnp.asarray(valid), block=block)
        np.testing.assert_array_equal(np.asarray(got_ok), np.asarray(ref_ok),
                                      err_msg=f"trial {trial}")
        ro, go = np.asarray(ref_ok), np.asarray(got_ok)
        np.testing.assert_array_equal(np.asarray(got_i)[go],
                                      np.asarray(ref_i)[ro],
                                      err_msg=f"trial {trial}")


def test_blockwise_tie_scores_match_sequential(rng):
    """Equal scores must resolve identically (stable sort vs first-argmax)."""
    from veto_tpu.ops.nms import nms_sequential

    n = 96
    xy = rng.uniform(0, 40, (n, 2)).astype(np.float32)
    wh = rng.uniform(10, 30, (n, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], axis=1)
    scores = rng.choice([0.25, 0.5, 0.75], n).astype(np.float32)
    ref_i, ref_ok = nms_sequential(jnp.asarray(boxes), jnp.asarray(scores),
                                   0.5, n)
    got_i, got_ok = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, n,
                        block=32)
    np.testing.assert_array_equal(np.asarray(got_ok), np.asarray(ref_ok))
    np.testing.assert_array_equal(
        np.asarray(got_i)[np.asarray(got_ok)],
        np.asarray(ref_i)[np.asarray(ref_ok)])


import pytest


@pytest.mark.slow
def test_blockwise_matches_sequential_rpn_scale(rng):
    """Production RPN shape: 6000 candidates -> 1000 keeps at IoU 0.7,
    default block size — guards the exact configuration the detect
    cascade compiles."""
    from veto_tpu.ops.nms import nms_sequential

    n = 6000
    centers = rng.uniform(0, 800, (n // 6 + 1, 2))
    idx = rng.randint(0, len(centers), n)
    xy = centers[idx] + rng.uniform(-20, 20, (n, 2))
    wh = rng.uniform(10, 200, (n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0, 1, (n,)).astype(np.float32)
    valid = rng.uniform(0, 1, n) > 0.05

    ref_i, ref_ok = nms_sequential(
        jnp.asarray(boxes), jnp.asarray(scores), 0.7, 1000,
        jnp.asarray(valid))
    got_i, got_ok = nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.7, 1000,
        jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(got_ok), np.asarray(ref_ok))
    np.testing.assert_array_equal(
        np.asarray(got_i)[np.asarray(got_ok)],
        np.asarray(ref_i)[np.asarray(ref_ok)])


@pytest.mark.parametrize("max_out", [32, 1000])
def test_early_exit_is_exact(rng, max_out):
    """The opt-in while_loop early exit (stop when the active prefix is
    exhausted or max_outputs keeps exist) must be bit-equal to the full
    fori walk — it is the RPN production path (rpn.py _select_single_level)."""
    n = 3000
    centers = rng.uniform(0, 500, (n // 8 + 1, 2))
    idx = rng.randint(0, len(centers), n)
    xy = centers[idx] + rng.uniform(-15, 15, (n, 2))
    wh = rng.uniform(10, 150, (n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0, 1, (n,)).astype(np.float32)
    valid = rng.uniform(0, 1, n) > 0.3

    a_i, a_ok = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.7, max_out,
                    jnp.asarray(valid), early_exit=False)
    b_i, b_ok = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.7, max_out,
                    jnp.asarray(valid), early_exit=True)
    np.testing.assert_array_equal(np.asarray(a_ok), np.asarray(b_ok))
    np.testing.assert_array_equal(np.asarray(a_i), np.asarray(b_i))
