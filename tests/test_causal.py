"""Causal-TDE predictor: effect arithmetic, moving averages, fusion types."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from veto_tpu.models.relation.freq_bias import FrequencyBias
from veto_tpu.models.relation.legacy.causal import CausalPredictor

B, N, P, D = 2, 6, 10, 64
NUM_OBJ, NUM_REL = 11, 7


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(0)
    boxes = np.sort(rng.uniform(0, 100, (B, N, 2, 2)), axis=2).reshape(B, N, 4)
    boxes[..., 2:] += 5.0
    return tuple(
        jnp.asarray(a)
        for a in (
            boxes.astype(np.float32),
            np.ones((B, N), bool),
            rng.randint(1, NUM_OBJ, (B, N)),
            rng.randn(B, N, NUM_OBJ).astype(np.float32),
            rng.randint(0, N, (B, P, 2)),
            np.ones((B, P), bool),
            rng.randn(B, N, D).astype(np.float32),
            rng.randn(B, P, D).astype(np.float32),
            np.asarray([[100.0, 100.0]] * B, np.float32),
        )
    )


def _make(effect, fusion="sum"):
    return CausalPredictor(
        num_obj_classes=NUM_OBJ, num_rel_classes=NUM_REL, hidden_dim=32,
        pooling_dim=D, in_channels=D, embed_dim=16, mode="sgcls",
        effect_type=effect, fusion_type=fusion,
    )


def test_freq_bias_soft_vs_hard_lookup(rng):
    fb = FrequencyBias(num_obj_classes=5, num_rel_classes=3)
    v = fb.init(jax.random.PRNGKey(0), jnp.zeros((1, 2), jnp.int32))
    table = rng.randn(25, 3).astype(np.float32)
    v = {"params": {"obj_baseline": jnp.asarray(table)}}
    # one-hot soft probs must equal the hard lookup
    labels = jnp.asarray([[2, 4]])
    hard = fb.apply(v, labels)
    prob = jnp.stack(
        [jax.nn.one_hot(labels[:, 0], 5), jax.nn.one_hot(labels[:, 1], 5)], -1
    )
    soft = fb.apply(v, prob, method="index_with_probability")
    np.testing.assert_allclose(np.asarray(hard), np.asarray(soft), atol=1e-5)


def test_tde_effect_is_difference_of_logits(inputs):
    """With a zero counterfactual the TDE must differ from the plain forward;
    the moving averages must move at train and stay fixed at eval."""
    m = _make("TDE")
    v = m.init(jax.random.PRNGKey(0), *inputs, train=True)
    out_t, mut = m.apply(v, *inputs, train=True, mutable=["batch_stats"])
    assert float(jnp.abs(mut["batch_stats"]["avg_post_ctx"]).sum()) > 0
    assert float(jnp.abs(mut["batch_stats"]["untreated_feat"]).sum()) > 0
    assert "untreated_dcd_feat" in mut["batch_stats"]["context_layer"]

    v2 = {"params": v["params"], "batch_stats": mut["batch_stats"]}
    out_tde = m.apply(v2, *inputs, train=False)
    m_none = _make("none")
    out_plain = m_none.apply(v2, *inputs, train=False)
    # effect subtraction changes the logits
    assert float(jnp.abs(out_tde.rel_dists - out_plain.rel_dists).max()) > 1e-4


@pytest.mark.parametrize("fusion", ["sum", "gate"])
def test_fusion_types_finite(inputs, fusion):
    m = _make("TE", fusion)
    v = m.init(jax.random.PRNGKey(1), *inputs, train=True)
    out, mut = m.apply(v, *inputs, train=True, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(out.rel_dists)).all()
    v2 = {"params": v["params"], "batch_stats": mut["batch_stats"]}
    oute = m.apply(v2, *inputs, train=False)
    assert np.isfinite(np.asarray(oute.rel_dists)).all()
