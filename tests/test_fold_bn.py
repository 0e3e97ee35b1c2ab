"""FrozenBN → conv folding (models/backbone/resnet.py fold_bn).

The detector is frozen during relation training, so folding the BN affine
into the conv kernels is exact; these tests pin (a) numerical equality of
the folded and unfolded backbones on the same (randomized-BN) weights,
(b) structural equality of `fold_frozen_bn_params` output with a
`fold_bn=True` init, and (c) the update-level fold used by the torch
importer."""

import numpy as np

import jax
import jax.numpy as jnp

from veto_tpu.models.backbone.resnet import (
    ResNetFPNBackbone,
    fold_frozen_bn_params,
)

KW = dict(stage_blocks=(1, 1, 1, 1), groups=4, width_per_group=8,
          fpn_channels=32, dtype=jnp.float32)


def _randomize_bn(p, rng):
    out = {}
    for k, v in p.items():
        if isinstance(v, dict):
            out[k] = _randomize_bn(v, rng)
        elif k in ("scale", "bias"):
            out[k] = jnp.asarray(
                rng.uniform(0.5, 1.5, v.shape).astype(np.float32))
        else:
            out[k] = v
    return out


def test_folded_backbone_equals_unfolded():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    m0 = ResNetFPNBackbone(**KW)
    m1 = ResNetFPNBackbone(fold_bn=True, **KW)
    params0 = _randomize_bn(m0.init(jax.random.PRNGKey(0), x)["params"], rng)
    params1 = dict(params0)
    params1["body"] = fold_frozen_bn_params(params0["body"])

    # folded tree must have exactly the fold_bn=True structure
    v1 = m1.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(v1["params"]) == jax.tree.structure(params1)

    a = m0.apply({"params": params0}, x)
    b = m1.apply({"params": params1}, x)
    for fa, fb in zip(a, b):
        np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                                   atol=1e-4, rtol=1e-4)


def test_fold_detector_updates():
    from veto_tpu.utils.torch_import import fold_detector_updates

    rng = np.random.RandomState(1)
    k = rng.randn(1, 1, 4, 8).astype(np.float32)
    s = rng.uniform(0.5, 1.5, 8).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    updates = {
        ("backbone", "body", "layer1_block0", "conv1", "kernel"): k,
        ("backbone", "body", "layer1_block0", "bn1", "scale"): s,
        ("backbone", "body", "layer1_block0", "bn1", "bias"): b,
        # non-body paths pass through untouched
        ("rpn", "conv", "kernel"): k,
    }
    out = fold_detector_updates(updates)
    np.testing.assert_allclose(
        out[("backbone", "body", "layer1_block0", "conv1", "kernel")], k * s)
    np.testing.assert_array_equal(
        out[("backbone", "body", "layer1_block0", "conv1", "bias")], b)
    assert ("backbone", "body", "layer1_block0", "bn1", "scale") not in out
    assert ("rpn", "conv", "kernel") in out
    assert len(out) == 3


def test_stem_s2d_exact():
    """Space-to-depth stem rewrite == plain 7x7/2 conv (resnet.py
    stem_conv_s2d): same params, identical output up to matmul
    reassociation."""
    from veto_tpu.models.backbone.resnet import StemConv

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 32, 48, 3).astype(np.float32))
    plain = StemConv(use_bias=True, s2d=False)
    fast = StemConv(use_bias=True, s2d=True)
    v = plain.init(jax.random.PRNGKey(0), x)
    a = plain.apply(v, x)
    b = fast.apply(v, x)
    assert a.shape == b.shape == (2, 16, 24, 64)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=1e-5)
    # odd input sizes fall back to the plain conv
    xo = x[:, :31, :47]
    c = fast.apply(v, xo)
    d = plain.apply(v, xo)
    np.testing.assert_allclose(np.asarray(c), np.asarray(d),
                               atol=2e-5, rtol=1e-5)


def test_stem_s2d_exact_one_channel():
    """1-channel variant (the depth backbone's conv1)."""
    from veto_tpu.models.backbone.resnet import StemConv

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 32, 48, 1).astype(np.float32))
    plain = StemConv(features=32, s2d=False)
    fast = StemConv(features=32, s2d=True)
    v = plain.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(plain.apply(v, x)),
                               np.asarray(fast.apply(v, x)),
                               atol=2e-5, rtol=1e-5)
