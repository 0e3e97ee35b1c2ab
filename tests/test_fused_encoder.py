"""Fused Pallas encoder: kernel correctness + impl equivalence.

Runs through the Pallas interpreter on CPU so CI needs no TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import veto_tpu.ops.fused_encoder as fe
import veto_tpu.ops.pair_attention as pa
from veto_tpu.models.relation.predictor_veto import VetoTrunk


@pytest.fixture(autouse=True)
def _interpret():
    fe.INTERPRET = True
    pa.INTERPRET = True
    yield
    fe.INTERPRET = False
    pa.INTERPRET = False


def _params(rng, d, f):
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1)  # noqa: E731
    return fe.EncoderLayerParams(
        ln1_scale=mk(d) + 1, ln1_bias=mk(d), w_qkv=mk(d, 3 * d),
        w_out=mk(d, d), b_out=mk(d), ln2_scale=mk(d) + 1, ln2_bias=mk(d),
        w1=mk(d, f), b1=mk(f), w2=mk(f, d), b2=mk(d),
    )


def test_fused_layer_matches_reference_fwd_and_grads():
    P, T, TP, D, F, H = 8, 19, 24, 96, 192, 6
    rng = np.random.RandomState(0)
    params = _params(rng, D, F)
    x3 = rng.randn(P, T, D).astype(np.float32)
    xp = np.zeros((P, TP, D), np.float32)
    xp[:, :T] = x3
    x = jnp.asarray(xp.reshape(P * TP, D))
    w = jnp.asarray(rng.randn(P, T, D).astype(np.float32))

    def loss(fn):
        def f(x, p):
            out = fn(x, p).reshape(P, TP, D)[:, :T]
            return (out.astype(jnp.float32) * w).sum()
        return f

    fused = loss(lambda x, p: fe.fused_encoder_layer(x, p, H, TP, T, 4))
    ref = loss(lambda x, p: fe.reference_encoder_layer(x, p, H, TP, T))
    np.testing.assert_allclose(float(fused(x, params)), float(ref(x, params)),
                               rtol=1e-5)
    g1 = jax.grad(fused, argnums=(0, 1))(x, params)
    g2 = jax.grad(ref, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=2e-5)
    for name in params._fields:
        a, b = getattr(g1[1], name), getattr(g2[1], name)
        scale = max(1.0, float(jnp.abs(b).max()))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=3e-6,
            err_msg=name)


def test_stash_backward_bit_identical():
    """The stashed-qkv/x1 MONOLITHIC backward (FUSED_STASH, split disabled)
    must produce bit-identical gradients to the recompute backward: the
    stash holds the exact bf16/f32 values the recompute path would
    rebuild."""
    P, T, TP, D, F, H = 8, 19, 24, 96, 192, 6
    rng = np.random.RandomState(4)
    params = _params(rng, D, F)
    x = jnp.asarray(rng.randn(P * TP, D).astype(np.float32))

    def loss(stash):
        def f(x, p):
            out = fe.fused_encoder_layer(x, p, H, TP, T, 4, None, None, stash)
            return (out.astype(jnp.float32) ** 2).sum()
        return f

    old = fe.FUSED_SPLIT
    fe.FUSED_SPLIT = False
    try:
        ga = jax.grad(loss(True), argnums=(0, 1))(x, params)
        gb = jax.grad(loss(False), argnums=(0, 1))(x, params)
    finally:
        fe.FUSED_SPLIT = old
    np.testing.assert_array_equal(np.asarray(ga[0]), np.asarray(gb[0]))
    for name in params._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(ga[1], name)), np.asarray(getattr(gb[1], name)),
            err_msg=name)


def test_split_backward_matches_recompute():
    """The two-pass split backward (FUSED_SPLIT, the TPU default) must match
    the single-kernel recompute backward to accumulation-order rounding —
    same math, the dW partial sums just tile differently."""
    P, T, TP, D, F, H = 16, 19, 24, 96, 192, 6
    rng = np.random.RandomState(5)
    params = _params(rng, D, F)
    x = jnp.asarray(rng.randn(P * TP, D).astype(np.float32))

    def loss(stash):
        def f(x, p):
            out = fe.fused_encoder_layer(x, p, H, TP, T, 4, None, None, stash)
            return (out.astype(jnp.float32) ** 2).sum()
        return f

    old = fe.FUSED_SPLIT
    try:
        # _bwd reads FUSED_SPLIT when the cotangent is pulled back, i.e.
        # inside the jax.grad call — toggle it around the WHOLE call
        fe.FUSED_SPLIT = True
        ga = jax.grad(loss(True), argnums=(0, 1))(x, params)
        fe.FUSED_SPLIT = False
        gb = jax.grad(loss(False), argnums=(0, 1))(x, params)
    finally:
        fe.FUSED_SPLIT = old
    np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gb[0]),
                               atol=2e-5)
    for name in params._fields:
        a, b = np.asarray(getattr(ga[1], name)), np.asarray(getattr(gb[1], name))
        scale = max(1.0, float(np.abs(b).max()))
        np.testing.assert_allclose(a / scale, b / scale, atol=3e-6,
                                   err_msg=name)


def test_split_backward_dw_scratch_bit_identical():
    """The FUSED_DW_SCRATCH experiment (VMEM-scratch dW accumulation with a
    single final flush) must be BIT-identical to the default += -on-output
    split backward: same adds in the same order, only the buffer differs."""
    P, T, TP, D, F, H = 16, 19, 24, 96, 192, 6
    rng = np.random.RandomState(7)
    params = _params(rng, D, F)
    x = jnp.asarray(rng.randn(P * TP, D).astype(np.float32))

    def f(x, p):
        out = fe.fused_encoder_layer(x, p, H, TP, T, 4, None, None, True)
        return (out.astype(jnp.float32) ** 2).sum()

    old_split, old_scratch = fe.FUSED_SPLIT, fe.FUSED_DW_SCRATCH
    try:
        fe.FUSED_SPLIT = True
        fe.FUSED_DW_SCRATCH = False
        ga = jax.grad(f, argnums=(0, 1))(x, params)
        fe.FUSED_DW_SCRATCH = True
        gb = jax.grad(f, argnums=(0, 1))(x, params)
    finally:
        fe.FUSED_SPLIT, fe.FUSED_DW_SCRATCH = old_split, old_scratch
    assert np.array_equal(np.asarray(ga[0]), np.asarray(gb[0]))
    for name in params._fields:
        a, b = np.asarray(getattr(ga[1], name)), np.asarray(getattr(gb[1], name))
        assert np.array_equal(a, b), name


def test_pair_attention_matches_reference():
    P, T, D, H = 16, 19, 96, 6
    rng = np.random.RandomState(1)
    q, k, v = (jnp.asarray(rng.randn(P, T, D).astype(np.float32))
               for _ in range(3))
    out = pa.pair_attention(q, k, v, H, 8)
    ref = pa.pair_attention_reference(q, k, v, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)
    g1 = jax.grad(lambda q, k, v: pa.pair_attention(q, k, v, H, 8).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(
        lambda q, k, v: pa.pair_attention_reference(q, k, v, H)
        .astype(jnp.float32).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


@pytest.mark.parametrize("train", [False, True])
@pytest.mark.parametrize("impl", ["fused", "pair_attn"])
def test_trunk_fused_equals_xla(train, impl):
    """VetoTrunk(encoder_impl='fused'/'pair_attn') == VetoTrunk('xla') on
    shared params (pair_attn: VERDICT r2 weak #4 — the mid-tier kernel is a
    reachable production option, not an orphan)."""
    B, N, P = 1, 5, 8
    rng = np.random.RandomState(2)
    kwargs = dict(
        num_obj_classes=11, embed_dim=16, dim=96, layers=2, heads=6,
        depth_proj_dim=64, visual_proj_dim=32, mode="predcls",
        dtype=jnp.float32, remat=False,
    )
    args = dict(
        boxes=jnp.asarray(np.sort(rng.uniform(0, 90, (B, N, 2, 2)), 2)
                          .reshape(B, N, 4).astype(np.float32)),
        box_mask=jnp.ones((B, N), bool),
        obj_labels=jnp.asarray(rng.randint(1, 11, (B, N))),
        obj_logits=jnp.zeros((B, N, 11)),
        pair_idx=jnp.asarray(rng.randint(0, N, (B, P, 2))),
        pair_mask=jnp.ones((B, P), bool),
        roi_features=jnp.asarray(rng.randn(B, N, 8, 8, 16).astype(np.float32)),
        depth_features=jnp.asarray(rng.randn(B, N, 8, 8, 16).astype(np.float32)),
    )
    xla = VetoTrunk(encoder_impl="xla", **kwargs)
    fused = VetoTrunk(encoder_impl=impl, **kwargs)
    variables = xla.init(jax.random.PRNGKey(0), **args, train=False)
    # identical param trees: the fused impl must init the same tree
    v2 = fused.init(jax.random.PRNGKey(0), **args, train=False)
    assert jax.tree.structure(variables["params"]) == jax.tree.structure(v2["params"])

    if train:
        a, _ = xla.apply(variables, **args, train=True, mutable=["batch_stats"])
        b, _ = fused.apply(variables, **args, train=True, mutable=["batch_stats"])
    else:
        a = xla.apply(variables, **args, train=False)
        b = fused.apply(variables, **args, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
