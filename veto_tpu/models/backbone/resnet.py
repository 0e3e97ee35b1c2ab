"""ResNet / ResNeXt body with frozen BatchNorm, NHWC, flax.linen.

TPU re-design of the reference backbone (pysgg/modeling/backbone/resnet.py:
ResNet:87, Bottleneck:252, FrozenBatchNorm variants :382-412).  Differences
that are deliberate:

  * NHWC layout (TPU-native; the reference is NCHW).
  * FrozenBatchNorm is folded to a per-channel (scale, bias) affine — the
    detector is entirely frozen during relation training
    (tools/relation_train_net.py:161-165), so running stats never update and
    the fold is exact.  The torch→jax weight importer performs that fold.
    With ``fold_bn=True`` the affine folds ALL the way into the conv
    weights (kernel *= scale, bias = bn bias; `fold_frozen_bn_params`
    converts an unfolded tree), removing every BN elementwise pass.
  * compute in a configurable dtype (bf16 by default), params in f32.

Architecture parity (maskrcnn-benchmark R-101-FPN 32x8d):
  stem: 7x7/2 conv 64ch + FrozenBN + ReLU + 3x3/2 maxpool
  stages: bottleneck counts (3, 4, 23, 3), out channels (256, 512, 1024,
  2048), grouped 3x3 convs (groups=32, width_per_group=8 → bottleneck
  channels 256/512/1024/2048), stride-in-1x1 (caffe convention,
  defaults.py STRIDE_IN_1X1).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    """Per-channel affine y = x * scale + bias.

    Exact fold of inference-mode BatchNorm:
      scale = gamma / sqrt(running_var + eps),  bias = beta - mean * scale
    (reference pysgg/layers/batch_norm.py FrozenBatchNorm2d).
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return x * scale.astype(self.dtype) + bias.astype(self.dtype)


class GroupedConv3x3(nn.Module):
    """3x3 grouped conv, with a TPU-friendly block-diagonal-dense mode.

    ResNeXt's 32x8d grouped convs (8 channels/group) map terribly onto the
    128x128 MXU — XLA's grouped-conv emitter runs them at <1% peak.  A dense
    conv whose kernel is the block-diagonal expansion of the grouped kernel
    is mathematically identical (zeros between groups), costs G x the FLOPs,
    but runs near full MXU tiling — measured 3.2x faster at stage-1 width
    (256ch) and 1.2x at stage 2 on v5e; at wider stages the FLOP multiplier
    wins, so expansion only triggers below ``dense_max_width``.  The param
    keeps the grouped (3, 3, C/G, C) shape, so torch checkpoint import is
    unaffected, and gradients land only on the block-diagonal (the mask is
    constant).
    """

    features: int
    groups: int
    stride: int = 1
    dense_max_width: int = 512
    use_bias: bool = False  # set by the fold_bn path (bias absorbs the BN)
    dtype: Any = jnp.float32

    def _merge_factor(self) -> int:
        """Groups merged per conv group (block-diagonal within the merge).

        Measured on v5e at the flagship 800x1344 stage shapes, each stage
        benched as its REAL chain of n grouped 3x3 convs inside one jit
        (single-conv timings mislead — XLA's layout choices differ once
        convs chain; round-3 re-sweep, ms per chain):

          width | n  | m=1  | m=2  | m=4  | m=8  | m=16 | dense
          ------|----|------|------|------|------|------|------
            256 |  3 |      |      |      | 12.3 |  9.9 | 13.2  ← merge 16
            512 |  4 |      | 11.5 |  8.7 |  6.7 | 10.0 |       ← merge 8
           1024 | 23 | 26.4 | 16.7 | 13.1 | 23.2 |      |       ← merge 4
           2048 |  3 |  3.5 |  3.3 |  4.0 |      |      |       ← merge 2

        m=4 at width 1024 makes each merged group exactly one 128x128 MXU
        tile (K = 4*32 = 128).

        Merging m groups multiplies the 3x3 FLOPs by m but gives the MXU
        m-times-wider channel blocks; the sweet spot shifts down as width
        (and with it per-tile efficiency) grows.
        """
        if self.groups == 1:
            return 1
        if self.features <= self.dense_max_width // 2:  # ≤256: merge 16
            return min(16, self.groups)
        if self.features <= self.dense_max_width:        # 512: merge 8
            return min(8, self.groups)
        if self.features <= 2 * self.dense_max_width:    # 1024: merge 4
            return min(4, self.groups)
        return min(2, self.groups)                       # ≥2048: merge 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        cg = c_in // self.groups
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cg, self.features), jnp.float32,
        ).astype(self.dtype)
        dn = ("NHWC", "HWIO", "NHWC")
        m = self._merge_factor()
        if m > 1:
            g_new = self.groups // m
            og = self.features // self.groups
            # block-diagonal expansion within each merged group: out channel
            # (h, j, o) reads in channels (j, :) of merged group h only
            k6 = kernel.reshape(3, 3, cg, g_new, m, og)
            eye = jnp.eye(m, dtype=self.dtype)
            kd = jnp.einsum("abihjo,kj->abkihjo", k6, eye).reshape(
                3, 3, m * cg, self.features
            )
            y = jax.lax.conv_general_dilated(
                x, kd, (self.stride, self.stride), ((1, 1), (1, 1)),
                feature_group_count=g_new, dimension_numbers=dn,
            )
        else:
            y = jax.lax.conv_general_dilated(
                x, kernel, (self.stride, self.stride), ((1, 1), (1, 1)),
                feature_group_count=self.groups, dimension_numbers=dn,
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def stem_conv_s2d(x: jnp.ndarray, kernel: jnp.ndarray,
                  dtype: Any) -> jnp.ndarray:
    """7x7/2 stem conv as space-to-depth(2) + 4x4/1 conv — exact rewrite.

    With C_in=3 the MXU pads the contraction to 8 channels, so the plain
    7x7 conv runs at 7*7*3/ (7*7*8) = 37% useful K at best (measured
    ~3.4 TF/s, ~12 ms of the flagship step).  Space-to-depth by 2 gives a
    12-channel input and a 4x4 kernel (the 7 stride-2 taps span 4 s2d
    pixels), raising useful K to 7*7*3/(4*4*12) = 77% on an
    MXU-friendlier shape.  The parameter keeps the reference (7,7,3,64)
    layout — the remap below is traced per step and fuses to nothing.

    Derivation: output row i reads input rows u = 2i+du, du ∈ [-3,3];
    u = 2(i-2+a)+r2 with tap a = (du+4)//2 ∈ [0,3] and parity r2 = u mod 2,
    i.e. du = 2(a-2)+r2 (du=-4 ⇔ (a=0, r2=0) never occurs → zero weights).
    Padding 3 on the original rows becomes (2,1) on s2d rows.
    """
    n, h, w, c = x.shape
    o = kernel.shape[-1]
    xs = x.reshape(n, h // 2, 2, w // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)
    k4 = jnp.zeros((4, 4, 4 * c, o), kernel.dtype)
    for a in range(4):
        for r2 in range(2):
            du = 2 * (a - 2) + r2
            if not -3 <= du <= 3:
                continue
            for b in range(4):
                for c2 in range(2):
                    dv = 2 * (b - 2) + c2
                    if not -3 <= dv <= 3:
                        continue
                    slot = r2 * 2 + c2
                    k4 = k4.at[a, b, slot * c:(slot + 1) * c].set(
                        kernel[du + 3, dv + 3])
    return jax.lax.conv_general_dilated(
        xs.astype(dtype), k4.astype(dtype), (1, 1), ((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class Bottleneck(nn.Module):
    """1x1 → grouped 3x3 → 1x1 bottleneck (resnet.py Bottleneck:252)."""

    bottleneck_channels: int
    out_channels: int
    stride: int = 1
    groups: int = 1
    stride_in_1x1: bool = True
    # deformable conv2 (reference resnet.py:299-315: STAGE_WITH_DCN
    # replaces the 3x3 with DFConv2d)
    with_dcn: bool = False
    dcn_modulated: bool = True
    dcn_deformable_groups: int = 1
    # fold the (frozen) BN affine into the conv weights: convs grow a bias,
    # the FrozenBatchNorm modules disappear.  The detector is frozen during
    # relation training, so the fold is exact; `fold_frozen_bn_params`
    # converts an unfolded tree (e.g. a torch import) into this layout.
    fold_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_channels = x.shape[-1]
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        fold = self.fold_bn

        def bn(name, feats, y):
            if fold:
                return y
            return FrozenBatchNorm(feats, self.dtype, name=name)(y)

        shortcut = x
        if in_channels != self.out_channels or self.stride != 1:
            shortcut = nn.Conv(
                self.out_channels, (1, 1), strides=(self.stride, self.stride),
                use_bias=fold, dtype=self.dtype, name="downsample_conv",
            )(x)
            shortcut = bn("downsample_bn", self.out_channels, shortcut)

        y = nn.Conv(
            self.bottleneck_channels, (1, 1), strides=(s1, s1),
            use_bias=fold, dtype=self.dtype, name="conv1",
        )(x)
        y = bn("bn1", self.bottleneck_channels, y)
        y = nn.relu(y)
        if self.with_dcn:
            from veto_tpu.ops.deform_conv import DFConv2d

            y = DFConv2d(
                features=self.bottleneck_channels,
                with_modulated_dcn=self.dcn_modulated,
                stride=(s3, s3), groups=self.groups,
                deformable_groups=self.dcn_deformable_groups,
                use_bias=fold, dtype=self.dtype, name="conv2",
            )(y)
        else:
            y = GroupedConv3x3(
                features=self.bottleneck_channels, groups=self.groups,
                stride=s3, use_bias=fold, dtype=self.dtype, name="conv2",
            )(y)
        y = bn("bn2", self.bottleneck_channels, y)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=fold,
                    dtype=self.dtype, name="conv3")(y)
        y = bn("bn3", self.out_channels, y)
        return nn.relu(y + shortcut)


class StemConv(nn.Module):
    """The 7x7/2 stem conv; param layout identical to ``nn.Conv`` (so the
    torch importer is unaffected) with an optional space-to-depth execution
    path (`stem_conv_s2d`) used whenever the input H,W are even.  Works for
    any input channel count (RGB detector stem C=3, depth backbone C=1)."""

    features: int = 64
    use_bias: bool = False
    s2d: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, x.shape[-1], self.features), jnp.float32)
        if self.s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            y = stem_conv_s2d(x, kernel, self.dtype)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype), (2, 2),
                ((3, 3), (3, 3)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class ResNetBody(nn.Module):
    """Stem + residual stages; returns feature maps C2..C5 (NHWC).

    Defaults are ResNeXt-101 32x8d as shipped in configs/VETO_final.yaml
    (CONV_BODY R-101-FPN + NUM_GROUPS 32, WIDTH_PER_GROUP 8).
    Plain R-50/R-101 via groups=1, width_per_group=64.
    """

    stage_blocks: Sequence[int] = (3, 4, 23, 3)
    groups: int = 32
    width_per_group: int = 8
    stride_in_1x1: bool = True
    fold_bn: bool = False
    stem_s2d: bool = True  # space-to-depth stem rewrite (exact; needs even H,W)
    # per-stage deformable conv2 (MODEL.RESNETS.STAGE_WITH_DCN)
    stage_with_dcn: Sequence[bool] = (False, False, False, False)
    dcn_modulated: bool = True   # WITH_MODULATED_DCN
    dcn_deformable_groups: int = 1  # DEFORMABLE_GROUPS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        x = x.astype(self.dtype)
        # --- stem (resnet.py BaseStem)
        x = StemConv(use_bias=self.fold_bn, s2d=self.stem_s2d,
                     dtype=self.dtype, name="stem_conv")(x)
        if not self.fold_bn:
            x = FrozenBatchNorm(64, self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        bottleneck = self.groups * self.width_per_group  # 256 for 32x8d
        out_channels = 256
        for stage_idx, num_blocks in enumerate(self.stage_blocks):
            for block_idx in range(num_blocks):
                stride = 2 if (block_idx == 0 and stage_idx > 0) else 1
                x = Bottleneck(
                    bottleneck_channels=bottleneck,
                    out_channels=out_channels,
                    stride=stride,
                    groups=self.groups,
                    stride_in_1x1=self.stride_in_1x1,
                    fold_bn=self.fold_bn,
                    with_dcn=bool(self.stage_with_dcn[stage_idx]),
                    dcn_modulated=self.dcn_modulated,
                    dcn_deformable_groups=self.dcn_deformable_groups,
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_block{block_idx}",
                )(x)
            outs.append(x)
            bottleneck *= 2
            out_channels *= 2
        return tuple(outs)


class ResNetFPNBackbone(nn.Module):
    """ResNet body + FPN → (P2, P3, P4, P5, P6), each `fpn_channels` wide.

    Reference build_resnet_fpn_backbone (backbone.py:33-55).
    """

    stage_blocks: Sequence[int] = (3, 4, 23, 3)
    groups: int = 32
    width_per_group: int = 8
    fpn_channels: int = 256
    fold_bn: bool = False
    stem_s2d: bool = True
    # the shipped VETO config sets RESNETS.STRIDE_IN_1X1 False
    # (VETO_final.yaml:12 — stride lives in the 3x3, torchvision style)
    stride_in_1x1: bool = False
    stage_with_dcn: Sequence[bool] = (False, False, False, False)
    dcn_modulated: bool = True
    dcn_deformable_groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        from .fpn import FPN

        body_outs = ResNetBody(
            stage_blocks=self.stage_blocks,
            groups=self.groups,
            width_per_group=self.width_per_group,
            fold_bn=self.fold_bn,
            stem_s2d=self.stem_s2d,
            stride_in_1x1=self.stride_in_1x1,
            stage_with_dcn=self.stage_with_dcn,
            dcn_modulated=self.dcn_modulated,
            dcn_deformable_groups=self.dcn_deformable_groups,
            dtype=self.dtype,
            name="body",
        )(x)
        return FPN(out_channels=self.fpn_channels, dtype=self.dtype, name="fpn")(body_outs)


def fold_frozen_bn_params(body_params):
    """Convert an UNFOLDED ResNet body param tree into the ``fold_bn=True``
    layout: every (conv, FrozenBatchNorm) pair becomes a conv with
    ``kernel' = kernel * scale`` (per output channel) and ``bias = bn.bias``.

    Exact because the detector is frozen (running stats never update,
    tools/relation_train_net.py:161-165).  Use on torch-imported trees:
    ``params['backbone']['body'] = fold_frozen_bn_params(...)``.
    """
    import numpy as np

    out = {}
    pairs = {"stem_conv": "stem_bn"}
    for name in body_params:
        if name.startswith("layer"):
            for conv, bn in (("conv1", "bn1"), ("conv2", "bn2"),
                             ("conv3", "bn3"),
                             ("downsample_conv", "downsample_bn")):
                if conv in body_params[name]:
                    pairs[(name, conv)] = (name, bn)

    def get(path):
        node = body_params
        for p in (path if isinstance(path, tuple) else (path,)):
            node = node[p]
        return node

    def setp(tree, path, value):
        node = tree
        path = path if isinstance(path, tuple) else (path,)
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    handled = set()
    for conv_path, bn_path in pairs.items():
        conv = get(conv_path)
        bn = get(bn_path)
        scale = np.asarray(bn["scale"])
        kernel = np.asarray(conv["kernel"]) * scale  # out dim is last
        setp(out, conv_path, {"kernel": jnp.asarray(kernel),
                              "bias": jnp.asarray(bn["bias"])})
        handled.add(conv_path if isinstance(conv_path, tuple) else (conv_path,))
        handled.add(bn_path if isinstance(bn_path, tuple) else (bn_path,))

    # copy everything not part of a folded pair
    def copy_rest(src, dst, prefix=()):
        for k, v in src.items():
            path = prefix + (k,)
            if path in handled:
                continue
            if isinstance(v, dict):
                copy_rest(v, dst, path)
            else:
                setp(dst, path, v)

    copy_rest(body_params, out)
    return out
