"""Torch → JAX weight-import parity tests.

Numeric parity is checked against real torch ops (torch-cpu is available):
a torch bottleneck block with FrozenBN + grouped conv must produce the same
output as our flax Bottleneck after import, and a full fake maskrcnn-style
state dict must land every covered tensor in the SGGModel tree.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from veto_tpu.models.backbone.resnet import Bottleneck
from veto_tpu.utils.torch_import import (
    apply_updates,
    detector_param_updates,
    load_torch_state_dict,
)


class _TorchFrozenBN(tnn.Module):
    """reference layers/batch_norm.py FrozenBatchNorm2d."""

    def __init__(self, n):
        super().__init__()
        self.register_buffer("weight", torch.rand(n) + 0.5)
        self.register_buffer("bias", torch.randn(n))
        self.register_buffer("running_mean", torch.randn(n))
        self.register_buffer("running_var", torch.rand(n) + 0.5)

    def forward(self, x):
        scale = self.weight * self.running_var.rsqrt()
        bias = self.bias - self.running_mean * scale
        return x * scale.reshape(1, -1, 1, 1) + bias.reshape(1, -1, 1, 1)


class _TorchBottleneck(tnn.Module):
    """Minimal replica of the reference Bottleneck (stride_in_1x1=False,
    grouped 3x3) for numeric parity."""

    def __init__(self, cin, bott, cout, groups, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, bott, 1, stride=1, bias=False)
        self.bn1 = _TorchFrozenBN(bott)
        self.conv2 = tnn.Conv2d(bott, bott, 3, stride=stride, padding=1,
                                groups=groups, bias=False)
        self.bn2 = _TorchFrozenBN(bott)
        self.conv3 = tnn.Conv2d(bott, cout, 1, bias=False)
        self.bn3 = _TorchFrozenBN(cout)
        self.downsample = tnn.Sequential(
            tnn.Conv2d(cin, cout, 1, stride=stride, bias=False),
            _TorchFrozenBN(cout),
        )

    def forward(self, x):
        idn = self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(y + idn)


def test_bottleneck_numeric_parity():
    torch.manual_seed(0)
    cin, bott, cout, groups, stride = 8, 16, 32, 4, 2
    tb = _TorchBottleneck(cin, bott, cout, groups, stride).eval()

    # fake a maskrcnn-benchmark state dict for layer1.0
    sd = {}
    sd["backbone.body.layer1.0.conv1.weight"] = tb.conv1.weight.detach().numpy()
    sd["backbone.body.layer1.0.conv2.weight"] = tb.conv2.weight.detach().numpy()
    sd["backbone.body.layer1.0.conv3.weight"] = tb.conv3.weight.detach().numpy()
    sd["backbone.body.layer1.0.downsample.0.weight"] = (
        tb.downsample[0].weight.detach().numpy()
    )
    for bn_name, bn in (("bn1", tb.bn1), ("bn2", tb.bn2), ("bn3", tb.bn3),
                        ("downsample.1", tb.downsample[1])):
        for f in ("weight", "bias", "running_mean", "running_var"):
            sd[f"backbone.body.layer1.0.{bn_name}.{f}"] = getattr(bn, f).numpy()

    fb = Bottleneck(bottleneck_channels=bott, out_channels=cout, stride=stride,
                    groups=groups, stride_in_1x1=False)
    x = np.random.RandomState(0).randn(1, 14, 14, cin).astype(np.float32)
    variables = fb.init(jax.random.PRNGKey(0), jnp.asarray(x))

    updates = detector_param_updates(sd)
    # re-root to this block
    block = {
        tuple(p[3:]): a for p, a in updates.items()
        if p[:3] == ("backbone", "body", "layer1_block0")
    }
    new_params, loaded, skipped = apply_updates(variables["params"], block)
    assert not skipped, skipped
    assert len(loaded) == 4 + 8  # 4 convs + 4 BNs x (scale, bias)

    got = fb.apply({"params": jax.tree.map(jnp.asarray, new_params)}, jnp.asarray(x))
    want = tb(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    want = np.transpose(want.detach().numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_full_state_dict_import(tmp_path):
    """A fake full checkpoint lands every covered tensor in SGGModel."""
    from veto_tpu.models.sgg import SGGModel

    model = SGGModel(
        num_obj_classes=11, num_rel_classes=7, mode="sgdet",
        stage_blocks=(1, 1, 1, 1), groups=1, width_per_group=16,
        fpn_channels=32, box_mlp_dim=64, detections_per_img=8,
        rpn_pre_nms_top_n=64, rpn_post_nms_top_n=16, rpn_fpn_post_nms_top_n=16,
        dtype=jnp.float32,
    )
    imgs = jnp.zeros((1, 64, 64, 3))
    depth = jnp.zeros((1, 64, 64, 1))
    boxes = jnp.zeros((1, 4, 4))
    bm = jnp.ones((1, 4), bool)
    labels = jnp.ones((1, 4), jnp.int32)
    logits = jnp.zeros((1, 4, 11))
    pi = jnp.zeros((1, 4, 2), jnp.int32)
    pm = jnp.ones((1, 4), bool)
    variables = model.init(
        jax.random.PRNGKey(0), imgs, depth, boxes, bm, labels, logits, pi, pm,
        method="init_all",
    )
    params = variables["params"]

    # build a torch state dict whose shapes mirror the flax tree
    def t_conv(k):
        return np.transpose(np.asarray(k), (3, 2, 0, 1))

    def t_fc(k):
        return np.transpose(np.asarray(k), (1, 0))

    rng = np.random.RandomState(0)
    sd = {}
    body = params["backbone"]["body"]
    sd["backbone.body.stem.conv1.weight"] = rng.randn(
        *t_conv(body["stem_conv"]["kernel"]).shape).astype(np.float32)
    for f, shape in (("weight", 64), ("bias", 64), ("running_mean", 64),
                     ("running_var", 64)):
        arr = rng.rand(shape).astype(np.float32) + 0.5
        sd[f"backbone.body.stem.bn1.{f}"] = arr
    for lk, lv in body.items():
        m = lk.startswith("layer")
        if not m:
            continue
        layer, block = lk.replace("layer", "").split("_block")
        pre = f"backbone.body.layer{layer}.{block}"
        for conv in ("conv1", "conv2", "conv3"):
            sd[f"{pre}.{conv}.weight"] = rng.randn(
                *t_conv(lv[conv]["kernel"]).shape).astype(np.float32)
            n = lv[conv.replace("conv", "bn")]["scale"].shape[0]
            for f in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{pre}.{conv.replace('conv', 'bn')}.{f}"] = (
                    rng.rand(n).astype(np.float32) + 0.5
                )
        if "downsample_conv" in lv:
            sd[f"{pre}.downsample.0.weight"] = rng.randn(
                *t_conv(lv["downsample_conv"]["kernel"]).shape).astype(np.float32)
            n = lv["downsample_bn"]["scale"].shape[0]
            for f in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{pre}.downsample.1.{f}"] = rng.rand(n).astype(np.float32) + 0.5
    for i in range(1, 5):
        for kind in ("inner", "layer"):
            # reference FPN convs are 1-indexed like ours (fpn.py,
            # verified end-to-end by test_whole_model_parity)
            k = params["backbone"]["fpn"][f"fpn_{kind}{i}"]
            sd[f"backbone.fpn.fpn_{kind}{i}.weight"] = rng.randn(
                *t_conv(k["kernel"]).shape).astype(np.float32)
            sd[f"backbone.fpn.fpn_{kind}{i}.bias"] = rng.randn(
                *k["bias"].shape).astype(np.float32)
    for name in ("conv", "cls_logits", "bbox_pred"):
        k = params["rpn"][name]
        sd[f"rpn.head.{name}.weight"] = rng.randn(
            *t_conv(k["kernel"]).shape).astype(np.float32)
        sd[f"rpn.head.{name}.bias"] = rng.randn(*k["bias"].shape).astype(np.float32)
    for src, (mod, leafname) in (
        ("roi_heads.box.feature_extractor.fc6", ("box_extractor", "fc6")),
        ("roi_heads.box.feature_extractor.fc7", ("box_extractor", "fc7")),
        ("roi_heads.box.predictor.cls_score", ("box_predictor", "cls_score")),
        ("roi_heads.box.predictor.bbox_pred", ("box_predictor", "bbox_pred")),
    ):
        k = params[mod][leafname]
        sd[f"{src}.weight"] = rng.randn(*t_fc(k["kernel"]).shape).astype(np.float32)
        sd[f"{src}.bias"] = rng.randn(*k["bias"].shape).astype(np.float32)

    # round-trip through a real torch checkpoint file
    path = str(tmp_path / "model_final.pth")
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()}}, path)
    sd2 = load_torch_state_dict(path)
    updates = detector_param_updates(sd2)
    new_params, loaded, skipped = apply_updates(params, updates)
    assert not skipped, skipped[:5]
    # every frozen-detector leaf was overwritten
    n_expected = sum(
        x.size >= 0
        for x in jax.tree.leaves(
            {k: params[k] for k in ("backbone", "rpn", "box_extractor", "box_predictor")}
        )
    )
    assert len(loaded) == n_expected


def test_grouped_conv_merge_variants_identical():
    """Every merge policy of GroupedConv3x3 (dense / partial merge /
    native) must equal the native grouped conv on the same kernel — the
    expansions are block-diagonal rewrites, not approximations."""
    from veto_tpu.models.backbone.resnet import GroupedConv3x3

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 10, 12, 64).astype(np.float32))
    # expected factors = the round-3 measured policy (resnet.py _merge_factor)
    for features, want_merge in ((64, 16), (512, 8), (1024, 4), (2048, 2)):
        m = GroupedConv3x3(features=features, groups=32, dense_max_width=512)
        assert m._merge_factor() == want_merge
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        ref = jax.lax.conv_general_dilated(
            x, v["params"]["kernel"], (1, 1), ((1, 1), (1, 1)),
            feature_group_count=32,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)
