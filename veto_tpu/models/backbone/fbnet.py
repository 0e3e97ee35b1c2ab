"""FBNet mobile backbone family, flax-native.

Rebuild of the reference FBNet stack
(pysgg/modeling/backbone/{fbnet.py,fbnet_builder.py,fbnet_modeldef.py},
~1.3k LoC): the searched-architecture table format ([t, c, n, s] block
configs + per-block op types), the arch-def expansion helpers, the
primitive block zoo (inverted-residual IRFBlock with optional channel
shuffle / SE / cascaded depthwise / upsample strides, CascadeConv3x3,
ShiftBlock5x5, Identity), and the width-scaled builder that materializes
trunk / RPN-head / ROI-head stages.

TPU notes: blocks are NHWC flax modules; the zero-FLOP "shift" op is a
frozen depthwise conv exactly like the reference (XLA folds it); the
depthwise convs use `feature_group_count`.  BN is trainable
``nn.BatchNorm`` ("bn"), GroupNorm ("gn"), frozen affine ("af"), or
absent — matching MODEL.FBNET.BN_TYPE.
"""

from __future__ import annotations

import copy
from typing import Any, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# ---------------------------------------------------------------------------
# arch tables (fbnet_modeldef.py — searched-architecture config VALUES)
# ---------------------------------------------------------------------------

MODEL_ARCH = {
    "default": {
        "block_op_type": [
            ["ir_k3"], ["ir_k3"] * 2, ["ir_k3"] * 3, ["ir_k3"] * 7,
            ["ir_k3"] * 4, ["ir_k3"] * 3, ["ir_k3"] * 5,
        ],
        "block_cfg": {
            "first": [32, 2],
            "stages": [
                [[1, 16, 1, 1]],
                [[6, 24, 2, 2]],
                [[6, 32, 3, 2]],
                [[6, 64, 4, 2], [6, 96, 3, 1]],
                [[4, 160, 1, 2], [6, 160, 2, 1], [6, 240, 1, 1]],  # bbox
                [[6, 96, 3, 1]],                                    # rpn
                [[4, 160, 1, 1], [6, 160, 3, 1], [3, 80, 1, -2]],   # mask
            ],
            "last": [0, 0.0],
            "backbone": [0, 1, 2, 3],
            "rpn": [5],
            "bbox": [4],
            "mask": [6],
        },
    },
    "xirb16d_dsmask": {
        "block_op_type": [
            ["ir_k3"], ["ir_k3"] * 2, ["ir_k3"] * 3, ["ir_k3"] * 7,
            ["ir_k3"] * 4, ["ir_k3"] * 5, ["ir_k3"] * 3,
        ],
        "block_cfg": {
            "first": [16, 2],
            "stages": [
                [[1, 16, 1, 1]],
                [[6, 32, 2, 2]],
                [[6, 48, 3, 2]],
                [[6, 96, 4, 2], [6, 128, 3, 1]],
                [[4, 128, 1, 2], [6, 128, 2, 1], [6, 160, 1, 1]],
                [[4, 128, 1, 2], [6, 128, 2, 1], [6, 128, 1, -2],
                 [3, 64, 1, -2]],
                [[6, 128, 3, 1]],
            ],
            "last": [0, 0.0],
            "backbone": [0, 1, 2, 3],
            "rpn": [6],
            "bbox": [4],
            "mask": [5],
        },
    },
    "mobilenet_v2": {
        "block_op_type": [
            ["ir_k3"], ["ir_k3"] * 2, ["ir_k3"] * 3, ["ir_k3"] * 7,
            ["ir_k3"] * 4,
        ],
        "block_cfg": {
            "first": [32, 2],
            "stages": [
                [[1, 16, 1, 1]],
                [[6, 24, 2, 2]],
                [[6, 32, 3, 2]],
                [[6, 64, 4, 2], [6, 96, 3, 1]],
                [[6, 160, 3, 1], [6, 320, 1, 1]],
            ],
            "last": [0, 0.0],
            "backbone": [0, 1, 2, 3],
            "bbox": [4],
        },
    },
    "cham_v1a": {
        "block_op_type": [
            ["ir_k3"], ["ir_k7"] * 2, ["ir_k3"] * 5,
            ["ir_k5"] * 7 + ["ir_k3"] * 5, ["ir_k3"] * 5, ["ir_k3"] * 3,
        ],
        "block_cfg": {
            "first": [32, 2],
            "stages": [
                [[1, 24, 1, 1]],
                [[4, 48, 2, 2]],
                [[7, 64, 5, 2]],
                [[12, 56, 7, 2], [8, 88, 5, 1]],
                [[7, 152, 4, 2], [10, 104, 1, 1]],
                [[8, 88, 3, 1]],
            ],
            "last": [0, 0.0],
            "backbone": [0, 1, 2, 3],
            "rpn": [5],
            "bbox": [4],
        },
    },
    "cham_v2": {
        "block_op_type": [
            ["ir_k3"], ["ir_k5"] * 4, ["ir_k7"] * 6,
            ["ir_k5"] * 3 + ["ir_k3"] * 6, ["ir_k3"] * 7, ["ir_k3"] * 1,
        ],
        "block_cfg": {
            "first": [32, 2],
            "stages": [
                [[1, 24, 1, 1]],
                [[8, 32, 4, 2]],
                [[5, 48, 6, 2]],
                [[9, 56, 3, 2], [6, 56, 6, 1]],
                [[2, 160, 6, 2], [6, 112, 1, 1]],
                [[6, 56, 1, 1]],
            ],
            "last": [0, 0.0],
            "backbone": [0, 1, 2, 3],
            "rpn": [5],
            "bbox": [4],
        },
    },
}


# ---------------------------------------------------------------------------
# arch-def expansion (fbnet_builder.py:563-691)
# ---------------------------------------------------------------------------

def _py2_round(x: float) -> int:
    """Python-2 round: half away from zero (fbnet_builder.py:26-27)."""
    import math

    return int(math.floor(x + 0.5) if x >= 0.0 else math.ceil(x - 0.5))


def get_divisible_by(num: int, divisible_by: int, min_val: int) -> int:
    """fbnet_builder.py:30-35 (banker's-rounded width divisibility)."""
    ret = int(num)
    if divisible_by > 0 and num % divisible_by != 0:
        ret = int((_py2_round(num / divisible_by) or min_val) * divisible_by)
    return ret


def _expand_block_cfg(block_cfg: List) -> List[List]:
    ret = []
    for idx in range(block_cfg[2]):
        cur = copy.deepcopy(block_cfg)
        cur[2] = 1
        cur[3] = 1 if idx >= 1 else cur[3]
        ret.append(cur)
    return ret


def expand_stage_cfg(stage_cfg: List) -> List[List]:
    ret: List[List] = []
    for x in stage_cfg:
        ret += _expand_block_cfg(x)
    return ret


def _block_cfgs_to_list(block_cfgs: List) -> List[dict]:
    ret = []
    for stage_idx, stage in enumerate(block_cfgs):
        for block_idx, block in enumerate(expand_stage_cfg(stage)):
            ret.append({"stage_idx": stage_idx, "block_idx": block_idx,
                        "block": block})
    return ret


def _add_to_arch(arch: List[dict], info: List[List], name: str) -> None:
    idx = 0
    for stage_idx, stage in enumerate(info):
        for block_idx, block in enumerate(stage):
            assert (arch[idx]["stage_idx"] == stage_idx
                    and arch[idx]["block_idx"] == block_idx)
            arch[idx][name] = block
            idx += 1


def unify_arch_def(arch_def: dict) -> dict:
    """fbnet_builder.py:641-668 — flatten block_cfg + op types into one
    per-block list under "stages"."""
    ret = copy.deepcopy(arch_def)
    ret.update({x: arch_def["block_cfg"][x] for x in arch_def["block_cfg"]})
    ret["stages"] = _block_cfgs_to_list(arch_def["block_cfg"]["stages"])
    del ret["block_cfg"]
    _add_to_arch(ret["stages"], arch_def["block_op_type"], "block_op_type")
    del ret["block_op_type"]
    return ret


def get_num_stages(arch_def: dict) -> int:
    return max(x["stage_idx"] for x in arch_def["stages"]) + 1


def get_blocks(arch_def: dict, stage_indices=None, block_indices=None) -> dict:
    ret = copy.deepcopy(arch_def)
    ret["stages"] = [
        b for b in arch_def["stages"]
        if (stage_indices in (None, []) or b["stage_idx"] in stage_indices)
        and (block_indices in (None, []) or b["block_idx"] in block_indices)
    ]
    return ret


# ---------------------------------------------------------------------------
# primitive blocks (fbnet_builder.py:195-560), NHWC flax
# ---------------------------------------------------------------------------

class ConvBNRelu(nn.Module):
    """conv → norm → relu (fbnet_builder.py:342-395)."""

    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    group: int = 1
    use_relu: bool = True
    bn_type: Union[str, Tuple[str, int], None] = "bn"
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        bn_type, gn_groups = self.bn_type, 32
        if isinstance(bn_type, (tuple, list)):
            bn_type, gn_groups = bn_type
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding=self.pad,
            feature_group_count=self.group, use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(
                2.0, "fan_out", "truncated_normal"),
            name="conv",
        )(x)
        if bn_type == "bn":
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        elif bn_type == "gn":
            x = nn.GroupNorm(num_groups=gn_groups, epsilon=1e-5,
                             dtype=self.dtype, name="bn")(x)
        elif bn_type == "af":
            from .resnet import FrozenBatchNorm

            x = FrozenBatchNorm(self.features, self.dtype, name="bn")(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class SEModule(nn.Module):
    """Squeeze-excite (fbnet_builder.py:397-411)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mid = max(self.channels // 4, 8)
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.relu(nn.Conv(mid, (1, 1), dtype=self.dtype, name="fc1")(s))
        s = jax.nn.sigmoid(nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                                   name="fc2")(s))
        return x * s


def channel_shuffle(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """fbnet_builder.py:322-339, NHWC."""
    n, h, w, c = x.shape
    assert c % groups == 0
    return x.reshape(n, h, w, groups, c // groups).swapaxes(
        -1, -2).reshape(n, h, w, c)


def _upsample_nearest(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * scale, w * scale, c),
                            method="nearest")


class IRFBlock(nn.Module):
    """Inverted residual (fbnet_builder.py:445-560): pw-expand →
    [shuffle] → [upsample] → dw (or cascaded dw) → pw-linear → [SE],
    residual when stride 1 and C_in == C_out.  Negative stride means
    nearest-neighbor upsample by |stride|."""

    features: int
    expansion: float = 6
    stride: int = 1
    kernel: int = 3
    bn_type: Any = "bn"
    width_divisor: int = 1
    shuffle_type: Optional[str] = None
    pw_group: int = 1
    se: bool = False
    cdw: bool = False
    dw_skip_bn: bool = False
    dw_skip_relu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cin = x.shape[-1]
        res = (self.stride == 1) and (cin == self.features)
        mid = get_divisible_by(int(cin * self.expansion),
                               self.width_divisor, self.width_divisor)
        y = ConvBNRelu(mid, kernel=1, stride=1, pad=0, group=self.pw_group,
                       bn_type=self.bn_type, dtype=self.dtype,
                       name="pw")(x, train)
        if self.shuffle_type == "mid":
            y = channel_shuffle(y, self.pw_group)
        stride = self.stride
        if stride < 0:
            y = _upsample_nearest(y, -stride)
            stride = 1
        if self.kernel != 1:
            if self.cdw:
                y = ConvBNRelu(mid, kernel=self.kernel, stride=stride,
                               pad=self.kernel // 2, group=mid,
                               bn_type=self.bn_type, dtype=self.dtype,
                               name="dw1")(y, train)
                y = ConvBNRelu(
                    mid, kernel=self.kernel, stride=1, pad=self.kernel // 2,
                    group=mid, use_relu=not self.dw_skip_relu,
                    bn_type=None if self.dw_skip_bn else self.bn_type,
                    dtype=self.dtype, name="dw2")(y, train)
            else:
                y = ConvBNRelu(
                    mid, kernel=self.kernel, stride=stride,
                    pad=self.kernel // 2, group=mid,
                    use_relu=not self.dw_skip_relu,
                    bn_type=None if self.dw_skip_bn else self.bn_type,
                    dtype=self.dtype, name="dw")(y, train)
        y = ConvBNRelu(self.features, kernel=1, stride=1, pad=0,
                       group=self.pw_group, use_relu=False,
                       bn_type=self.bn_type, dtype=self.dtype,
                       name="pwl")(y, train)
        if res:
            y = y + x
        if self.se:
            y = SEModule(self.features, dtype=self.dtype, name="se")(y)
        return y


class IdentityBlock(nn.Module):
    """'skip' primitive (fbnet_builder.py:195-219)."""

    features: int
    stride: int = 1
    bn_type: Any = "bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if x.shape[-1] == self.features and self.stride == 1:
            return x
        return ConvBNRelu(self.features, kernel=1, stride=self.stride,
                          pad=0, bn_type="bn", dtype=self.dtype,
                          name="conv")(x, train)


class CascadeConv3x3(nn.Module):
    """'basic_block' primitive (fbnet_builder.py:221-238)."""

    features: int
    stride: int = 1
    bn_type: Any = "bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cin = x.shape[-1]
        y = ConvBNRelu(cin, kernel=3, stride=self.stride, pad=1,
                       bn_type="bn", dtype=self.dtype, name="conv1")(x, train)
        y = ConvBNRelu(self.features, kernel=3, stride=1, pad=1,
                       use_relu=False, bn_type="bn", dtype=self.dtype,
                       name="conv2")(y, train)
        if self.stride == 1 and cin == self.features:
            y = y + x
        return y


def _shift_kernel(c: int, kernel_size: int) -> np.ndarray:
    """The frozen shift depthwise kernel (fbnet_builder.py:241-267):
    channel slab i*k+j shifts by (i, j); the center slab absorbs the
    remainder channels."""
    kernel = np.zeros((kernel_size, kernel_size, 1, c), np.float32)
    hks = kernel_size // 2
    ksq = kernel_size ** 2
    ch = 0
    for i in range(kernel_size):
        for j in range(kernel_size):
            num = c // ksq + (c % ksq if (i == hks and j == hks) else 0)
            kernel[i, j, 0, ch:ch + num] = 1
            ch += num
    return kernel


class ShiftBlock5x5(nn.Module):
    """'shift_5x5' primitive (fbnet_builder.py:295-319): pw-expand →
    frozen 5x5 shift → pw-linear, residual at stride 1."""

    features: int
    expansion: float = 1
    stride: int = 1
    bn_type: Any = "bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cin = x.shape[-1]
        mid = get_divisible_by(int(cin * self.expansion), 8, 8)
        y = ConvBNRelu(mid, kernel=1, stride=1, pad=0, bn_type="bn",
                       dtype=self.dtype, name="pw")(x, train)
        shift = jnp.asarray(_shift_kernel(mid, 5), self.dtype)
        y = jax.lax.conv_general_dilated(
            y.astype(self.dtype), shift, (self.stride, self.stride),
            ((2, 2), (2, 2)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=mid)
        y = ConvBNRelu(self.features, kernel=1, stride=1, pad=0,
                       use_relu=False, bn_type="bn", dtype=self.dtype,
                       name="pwl")(y, train)
        if self.stride == 1 and cin == self.features:
            y = y + x
        return y


# op name → (module factory kwargs); mirrors PRIMITIVES
# (fbnet_builder.py:37-192).  Each entry maps to IRFBlock kwargs unless a
# dedicated class is named.
def _primitive(op: str, features: int, expansion: float, stride: int,
               bn_type, width_divisor: int, dw_skip_bn: bool,
               dw_skip_relu: bool, dtype, name: str):
    common = dict(features=features, stride=stride, bn_type=bn_type,
                  dtype=dtype, name=name)
    ir = dict(common, expansion=expansion, width_divisor=width_divisor,
              dw_skip_bn=dw_skip_bn, dw_skip_relu=dw_skip_relu)
    if op == "skip":
        return IdentityBlock(**common)
    if op == "basic_block":
        return CascadeConv3x3(**common)
    if op == "shift_5x5":
        return ShiftBlock5x5(**common, expansion=expansion)
    if not op.startswith("ir_"):
        raise KeyError(f"unknown FBNet primitive: {op}")
    if op == "shuffle":
        return IRFBlock(**ir, shuffle_type="mid", pw_group=4)
    parts = op.split("_")[1:]  # after 'ir'
    kw: dict = {}
    k = parts[0]
    if k == "k33":
        kw["kernel"] = 3
        kw["cdw"] = True
    else:
        kw["kernel"] = int(k[1:])
    for p in parts[1:]:
        if p.startswith("e"):
            ir["expansion"] = float(p[1:])
        elif p.startswith("s") and p != "sep" and p != "se":
            kw["shuffle_type"] = "mid"
            kw["pw_group"] = int(p[1:])
            if "e" not in "".join(parts[1:]):
                pass
        elif p == "sep":
            kw["cdw"] = True
        elif p == "se":
            kw["se"] = True
    # sN variants pin expansion (s4 ⇒ e4, s2 ⇒ e1) per PRIMITIVES
    for p in parts[1:]:
        if p.startswith("s") and p not in ("sep", "se"):
            ir["expansion"] = 4.0 if p == "s4" else 1.0
    return IRFBlock(**ir, **kw)


class FBNetBuilder:
    """Width-scaled stage materializer (fbnet_builder.py:693-829).

    Mirrors the reference's stateful ``last_depth`` bookkeeping; emits
    configured flax Modules (declarative — applied by FBNetStages).
    """

    def __init__(self, width_ratio: float, bn_type="bn", width_divisor=1,
                 dw_skip_bn=False, dw_skip_relu=False, dtype=jnp.float32):
        self.width_ratio = width_ratio
        self.last_depth = -1
        self.bn_type = bn_type
        self.width_divisor = width_divisor
        self.dw_skip_bn = dw_skip_bn
        self.dw_skip_relu = dw_skip_relu
        self.dtype = dtype

    def _width(self, w: int) -> int:
        return get_divisible_by(int(w), self.width_divisor,
                                self.width_divisor)

    def add_first(self, stage_info) -> nn.Module:
        channel, stride = stage_info[0], stage_info[1]
        kernel = stage_info[2] if len(stage_info) > 2 else 3
        out = self._width(int(channel * self.width_ratio))
        self.last_depth = out
        return ConvBNRelu(out, kernel=kernel, stride=stride,
                          pad=kernel // 2, bn_type=self.bn_type,
                          dtype=self.dtype, name="first")

    def add_blocks(self, blocks: List[dict]) -> List[nn.Module]:
        mods = []
        for block in blocks:
            t, c, n, s = block["block"]
            assert n == 1
            out = self._width(int(c * self.width_ratio))
            mods.append(_primitive(
                block["block_op_type"], out, t, s, self.bn_type,
                self.width_divisor, self.dw_skip_bn, self.dw_skip_relu,
                self.dtype,
                name=f"xif{block['stage_idx']}_{block['block_idx']}"))
            self.last_depth = out
        return mods

    def add_last(self, stage_info) -> Optional[nn.Module]:
        channels, channel_scale = stage_info
        if channel_scale == 0.0:
            return None
        if channel_scale > 0:
            last = int(channels * self.width_ratio) if self.width_ratio > 1.0 \
                else channels
            last = int(last * channel_scale)
        else:
            last = int(self.last_depth * (-channel_scale))
        last = self._width(last)
        if last == 0:
            return None
        self.last_depth = last
        return ConvBNRelu(last, kernel=1, stride=1, pad=0,
                          bn_type=self.bn_type, dtype=self.dtype,
                          name="last")


class FBNetTrunk(nn.Module):
    """first conv + backbone stages → one feature map
    (fbnet.py:81-105); out stride is the arch's backbone stride
    (16 for the shipped archs)."""

    arch: str = "default"
    width_ratio: float = 1.0
    bn_type: Any = "bn"
    width_divisor: int = 1
    dw_skip_bn: bool = False
    dw_skip_relu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        arch_def = unify_arch_def(MODEL_ARCH[self.arch])
        builder = FBNetBuilder(self.width_ratio, self.bn_type,
                               self.width_divisor, self.dw_skip_bn,
                               self.dw_skip_relu, self.dtype)
        first = builder.add_first(arch_def["first"])
        trunk_stages = arch_def.get(
            "backbone", list(range(get_num_stages(arch_def) - 1)))
        blocks = builder.add_blocks(
            get_blocks(arch_def, stage_indices=trunk_stages)["stages"])
        y = first(x, train)
        for m in blocks:
            y = m(y, train)
        return y


def fbnet_trunk_out_channels(arch: str, width_ratio: float = 1.0,
                             width_divisor: int = 1) -> int:
    """Static out-channel computation (fbnet.py add_conv_body
    model.out_channels) without building modules."""
    arch_def = unify_arch_def(MODEL_ARCH[arch])
    builder = FBNetBuilder(width_ratio, width_divisor=width_divisor)
    builder.add_first(arch_def["first"])
    trunk_stages = arch_def.get(
        "backbone", list(range(get_num_stages(arch_def) - 1)))
    builder.add_blocks(
        get_blocks(arch_def, stage_indices=trunk_stages)["stages"])
    return builder.last_depth


class FBNetRPNHead(nn.Module):
    """RPN feature stage (fbnet.py:120-153): the arch's 'rpn' stage
    applied per FPN level (single level for these archs)."""

    arch: str = "default"
    width_ratio: float = 1.0
    bn_type: Any = "bn"
    width_divisor: int = 1
    rpn_head_blocks: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        arch_def = unify_arch_def(MODEL_ARCH[self.arch])
        builder = FBNetBuilder(self.width_ratio, self.bn_type,
                               self.width_divisor, dtype=self.dtype)
        builder.last_depth = x.shape[-1]
        stages = get_blocks(
            arch_def, stage_indices=arch_def.get("rpn"))["stages"]
        if self.rpn_head_blocks > 0:
            count = len(stages)
            keep = range(count - self.rpn_head_blocks, count)
            stages = [s for s in stages if s["block_idx"] in keep]
        for m in builder.add_blocks(stages):
            x = m(x, train)
        return x


class FBNetROIHead(nn.Module):
    """ROI-head stage over pooled maps (fbnet.py:173-206): the arch's
    'bbox'/'mask'/'kpts' stage + the scaled 'last' 1x1.  Pooling lives at
    the model level in this rebuild; input is (R, P, P, C)."""

    arch: str = "default"
    head_name: str = "bbox"
    width_ratio: float = 1.0
    bn_type: Any = "bn"
    width_divisor: int = 1
    use_blocks: Tuple[int, ...] = ()
    stride_init: int = 0
    last_layer_scale: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        arch_def = unify_arch_def(MODEL_ARCH[self.arch])
        head_name = self.head_name if self.head_name in arch_def else "head"
        stage = get_blocks(
            arch_def, stage_indices=arch_def.get(head_name),
            block_indices=list(self.use_blocks) or None)["stages"]
        stage = copy.deepcopy(stage)
        if self.stride_init != 0:
            stage[0]["block"][3] = self.stride_init
        builder = FBNetBuilder(self.width_ratio, self.bn_type,
                               self.width_divisor, dtype=self.dtype)
        builder.last_depth = x.shape[-1]
        mods = builder.add_blocks(stage)
        last = builder.add_last(
            [arch_def["last"][0], self.last_layer_scale])
        for m in mods:
            x = m(x, train)
        if last is not None:
            x = last(x, train)
        return x
