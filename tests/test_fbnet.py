"""FBNet backbone family vs the live reference builder.

Covers: arch-table equality, the width-divisibility math, trunk
out-channel parity for every shipped arch at several width ratios,
structural (per-block type/stride/width) parity of the materialized
trunk, numeric IRFBlock parity with copied weights, and trunk/RPN/ROI
module forwards.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_loader import load_ref_fbnet, reference_available

from veto_tpu.models.backbone import fbnet as jf

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not mounted"
)


def test_arch_tables_match_reference():
    _, modeldef = load_ref_fbnet()
    assert sorted(jf.MODEL_ARCH) == sorted(modeldef.MODEL_ARCH)
    for name in jf.MODEL_ARCH:
        assert jf.MODEL_ARCH[name] == modeldef.MODEL_ARCH[name], name


@pytest.mark.parametrize("num,div", [(17, 8), (16, 8), (3, 8), (100, 16),
                                     (12, 1), (20, 8), (28, 8)])
def test_divisible_width_parity(num, div):
    builder, _ = load_ref_fbnet()
    assert jf.get_divisible_by(num, div, div) == builder._get_divisible_by(
        num, div, div)


@pytest.mark.parametrize("arch", sorted(jf.MODEL_ARCH))
@pytest.mark.parametrize("ratio", [1.0, 0.5, 1.5])
def test_trunk_out_channels_parity(arch, ratio):
    builder_mod, modeldef = load_ref_fbnet()
    arch_def = builder_mod.unify_arch_def(modeldef.MODEL_ARCH[arch])
    rb = builder_mod.FBNetBuilder(width_ratio=ratio, bn_type="bn",
                                  width_divisor=8)
    rb.add_first(arch_def["first"])
    trunk = arch_def.get("backbone",
                         range(builder_mod.get_num_stages(arch_def) - 1))
    rb.add_blocks(builder_mod.get_blocks(
        arch_def, stage_indices=trunk)["stages"])
    got = jf.fbnet_trunk_out_channels(arch, ratio, width_divisor=8)
    assert got == rb.last_depth, (arch, ratio, got, rb.last_depth)


def test_trunk_structure_parity_default():
    """Per-block (op, stride, out-width) of the materialized 'default'
    trunk matches the reference modules."""
    builder_mod, modeldef = load_ref_fbnet()
    arch_def = builder_mod.unify_arch_def(modeldef.MODEL_ARCH["default"])
    rb = builder_mod.FBNetBuilder(width_ratio=1.0, bn_type="bn",
                                  width_divisor=1)
    rb.add_first(arch_def["first"])
    blocks = builder_mod.get_blocks(
        arch_def, stage_indices=arch_def["backbone"])["stages"]
    ref_stages = rb.add_blocks(blocks)
    ref_blocks = list(ref_stages.children())

    ours = jf.unify_arch_def(jf.MODEL_ARCH["default"])
    got_blocks = jf.get_blocks(ours, stage_indices=ours["backbone"])["stages"]
    assert len(got_blocks) == len(ref_blocks)
    for cfg, ref in zip(got_blocks, ref_blocks):
        assert ref.output_depth == jf.get_divisible_by(cfg["block"][1], 1, 1)


def test_irfblock_numeric_parity():
    """One IRFBlock with copied weights: torch reference forward (eval
    mode) vs flax forward (train=False, identity running stats)."""
    builder_mod, _ = load_ref_fbnet()
    torch.manual_seed(0)
    cin, cout, exp, stride, kernel = 8, 8, 3, 1, 3
    ref = builder_mod.IRFBlock(cin, cout, exp, stride, kernel=kernel)
    ref.eval()

    x = np.random.RandomState(1).randn(2, cin, 9, 9).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    mod = jf.IRFBlock(features=cout, expansion=exp, stride=stride,
                      kernel=kernel)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = mod.init(jax.random.PRNGKey(0), xj)

    # copy torch weights into the flax tree (OIHW→HWIO; depthwise
    # (C,1,kh,kw)→(kh,kw,1,C))
    params = jax.tree.map(lambda a: a, variables["params"])

    def conv_w(t, depthwise=False):
        w = t.detach().numpy()
        if depthwise:
            return np.transpose(w, (2, 3, 1, 0))
        return np.transpose(w, (2, 3, 1, 0))

    params["pw"]["conv"]["kernel"] = jnp.asarray(conv_w(ref.pw.conv.weight))
    params["dw"]["conv"]["kernel"] = jnp.asarray(
        conv_w(ref.dw.conv.weight, depthwise=True))
    params["pwl"]["conv"]["kernel"] = jnp.asarray(conv_w(ref.pwl.conv.weight))
    for ours_bn, theirs in (("pw", ref.pw.bn), ("dw", ref.dw.bn),
                            ("pwl", ref.pwl.bn)):
        params[ours_bn]["bn"]["scale"] = jnp.asarray(
            theirs.weight.detach().numpy())
        params[ours_bn]["bn"]["bias"] = jnp.asarray(
            theirs.bias.detach().numpy())
    stats = variables["batch_stats"]
    for ours_bn, theirs in (("pw", ref.pw.bn), ("dw", ref.dw.bn),
                            ("pwl", ref.pwl.bn)):
        stats[ours_bn]["bn"]["mean"] = jnp.asarray(
            theirs.running_mean.numpy())
        stats[ours_bn]["bn"]["var"] = jnp.asarray(theirs.running_var.numpy())

    got = mod.apply({"params": params, "batch_stats": stats}, xj,
                    train=False)
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want,
        rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("arch", ["default", "mobilenet_v2"])
def test_trunk_forward(arch):
    trunk = jf.FBNetTrunk(arch=arch)
    x = jnp.zeros((1, 64, 64, 3))
    v = trunk.init(jax.random.PRNGKey(0), x)
    y, _ = trunk.apply(v, x, train=True, mutable=["batch_stats"])
    assert y.shape[1] == 64 // 16  # stride-16 trunk
    assert y.shape[-1] == jf.fbnet_trunk_out_channels(arch)
    assert np.isfinite(np.asarray(y)).all()


def test_rpn_and_roi_heads_forward():
    trunk_c = jf.fbnet_trunk_out_channels("default")
    head = jf.FBNetRPNHead(arch="default")
    f = jnp.zeros((1, 8, 8, trunk_c))
    v = head.init(jax.random.PRNGKey(0), f)
    y, _ = head.apply(v, f, train=True, mutable=["batch_stats"])
    assert y.shape[:3] == (1, 8, 8)

    roi = jf.FBNetROIHead(arch="default", head_name="bbox",
                          stride_init=0, last_layer_scale=1.0)
    p = jnp.zeros((4, 7, 7, trunk_c))
    v2 = roi.init(jax.random.PRNGKey(1), p)
    z, _ = roi.apply(v2, p, train=True, mutable=["batch_stats"])
    # bbox stage starts with stride 2: 7x7 → 4x4
    assert z.shape[:3] == (4, 4, 4)
    assert np.isfinite(np.asarray(z)).all()


def test_shift_block_and_primitive_map():
    """shift_5x5 + the primitive-name decoding table."""
    x = jnp.asarray(np.random.RandomState(2).randn(1, 8, 8, 8), jnp.float32)
    m = jf.ShiftBlock5x5(features=8, expansion=2, stride=1)
    v = m.init(jax.random.PRNGKey(0), x)
    y, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert y.shape == x.shape

    # decode spot-checks vs PRIMITIVES semantics
    b = jf._primitive("ir_k5_e3", 8, 99, 1, "bn", 1, False, False,
                      jnp.float32, "t1")
    assert b.kernel == 5 and b.expansion == 3
    b = jf._primitive("ir_k3_s4_se", 8, 99, 1, "bn", 1, False, False,
                      jnp.float32, "t2")
    assert b.pw_group == 4 and b.se and b.expansion == 4.0
    b = jf._primitive("ir_k7_sep", 8, 2.5, 1, "bn", 1, False, False,
                      jnp.float32, "t3")
    assert b.cdw and b.kernel == 7 and b.expansion == 2.5
    b = jf._primitive("ir_k33_e6", 8, 99, 1, "bn", 1, False, False,
                      jnp.float32, "t4")
    assert b.cdw and b.kernel == 3 and b.expansion == 6
