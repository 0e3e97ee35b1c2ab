"""Pair sampling semantics vs the reference's gtbox_relsample /
prepare_test_pairs (pysgg/.../relation_head/sampling.py:31-107)."""

import jax
import jax.numpy as jnp
import numpy as np

from veto_tpu.models.relation.sampling import gtbox_relsample, prepare_test_pairs


def _toy_rel_matrix(n=8, num_rel=5, seed=0):
    rng = np.random.RandomState(seed)
    m = np.zeros((n, n), np.int32)
    placed = 0
    while placed < num_rel:
        s, o = rng.randint(0, n, 2)
        if s != o and m[s, o] == 0:
            m[s, o] = rng.randint(1, 51)
            placed += 1
    return m


class TestGtboxRelsample:
    def test_all_fg_kept_when_under_quota(self):
        m = _toy_rel_matrix(n=8, num_rel=5)
        mask = jnp.ones(8, bool)
        out = gtbox_relsample(jax.random.PRNGKey(0), jnp.asarray(m), mask,
                              batch_size=16, positive_fraction=0.25)
        # quota = 4 positives < 5 fg → exactly 4 fg sampled
        fg = np.asarray(out.labels) > 0
        assert fg.sum() == 4
        # every fg pair corresponds to a real GT relation with the right label
        for (s, o), lab in zip(np.asarray(out.pair_idx)[fg], np.asarray(out.labels)[fg]):
            assert m[s, o] == lab

    def test_bg_fill_and_masks(self):
        m = _toy_rel_matrix(n=6, num_rel=2)
        mask = jnp.ones(6, bool)
        out = gtbox_relsample(jax.random.PRNGKey(1), jnp.asarray(m), mask,
                              batch_size=16, positive_fraction=0.25)
        labels = np.asarray(out.labels)
        valid = np.asarray(out.mask)
        # 2 fg + up to 14 bg from 6*5-2=28 candidates → batch full
        assert (labels[valid] > 0).sum() == 2
        assert ((labels[valid] == 0).sum()) == 14
        # fg emitted before bg (reference cat order)
        first_bg = np.argmax(labels == 0)
        assert np.all(labels[:first_bg] > 0)
        # bg pairs must carry no GT relation and not be self-pairs
        for s, o in np.asarray(out.pair_idx)[valid & (labels == 0)]:
            assert s != o and m[s, o] == 0

    def test_padding_when_few_boxes(self):
        m = np.zeros((3, 3), np.int32)
        m[0, 1] = 7
        mask = jnp.array([True, True, True, False, False, False])
        m6 = np.zeros((6, 6), np.int32)
        m6[:3, :3] = m
        out = gtbox_relsample(jax.random.PRNGKey(2), jnp.asarray(m6), mask,
                              batch_size=16, positive_fraction=0.25)
        valid = np.asarray(out.mask)
        # 1 fg + 5 bg (3*2-1) = 6 valid, rest padding with label -1
        assert valid.sum() == 6
        assert np.all(np.asarray(out.labels)[~valid] == -1)
        # no sampled pair touches an invalid box
        assert np.asarray(out.pair_idx)[valid].max() < 3

    def test_binary_rel_symmetric(self):
        m = _toy_rel_matrix(n=8, num_rel=4)
        out = gtbox_relsample(jax.random.PRNGKey(0), jnp.asarray(m),
                              jnp.ones(8, bool), batch_size=8)
        b = np.asarray(out.binary_rel)
        assert np.array_equal(b, b.T)
        assert b[m > 0].min() == 1

    def test_deterministic(self):
        m = _toy_rel_matrix()
        a = gtbox_relsample(jax.random.PRNGKey(3), jnp.asarray(m), jnp.ones(8, bool))
        b = gtbox_relsample(jax.random.PRNGKey(3), jnp.asarray(m), jnp.ones(8, bool))
        assert np.array_equal(np.asarray(a.pair_idx), np.asarray(b.pair_idx))


class TestPrepareTestPairs:
    def test_all_pairs_no_cap(self):
        mask = jnp.array([True] * 4 + [False] * 2)
        idx, m = prepare_test_pairs(mask, jnp.ones(6), max_pairs=20)
        assert m.sum() == 12  # 4*3 ordered pairs
        pairs = {tuple(p) for p in np.asarray(idx)[np.asarray(m)]}
        assert len(pairs) == 12
        assert all(s != o and s < 4 and o < 4 for s, o in pairs)

    def test_cap_by_score_product(self):
        mask = jnp.ones(4, bool)
        scores = jnp.array([0.9, 0.8, 0.1, 0.05])
        idx, m = prepare_test_pairs(mask, scores, max_pairs=2)
        kept = {tuple(p) for p in np.asarray(idx)[np.asarray(m)]}
        # top products: (0,1) and (1,0)
        assert kept == {(0, 1), (1, 0)}

    def test_pad_beyond_all_pairs(self):
        mask = jnp.ones(3, bool)
        idx, m = prepare_test_pairs(mask, jnp.ones(3), max_pairs=16)
        assert m.shape == (16,)
        assert m.sum() == 6
