"""VGG-16 single-scale conv body (legacy alternative backbone).

Re-design of the reference VGG16 (pysgg/modeling/backbone/vgg.py:32-44,
registered as "VGG-16" in backbone.py:13-22): torchvision ``vgg16.features``
with the final maxpool deleted AND — a reference quirk worth preserving for
weight parity — the final ReLU dropped by the ``[:-1]`` slice, so the body
ends on the conv5_3 *pre-activation*.  Output: one (H/16, W/16, 512) map
(``MODEL.VGG.VGG16_OUT_CHANNELS``, defaults.py:603-604).

Unlike the FPN backbones this produces a single pyramid level; the detector
then runs the reference's non-FPN RPN configuration — all five anchor sizes
on the one stride-16 grid (defaults.py:152-158 ANCHOR_SIZES x ANCHOR_STRIDE
= (16,)) — and single-level ROIAlign at scale 1/16.

TPU notes: plain 3x3 convs map straight onto the MXU via XLA; there is no
BN to fold and no grouped-conv policy needed.  The stem runs at the full
image resolution, so the first two 64-channel convs dominate FLOPs — they
are left to XLA's spatial tiling (space-to-depth does not pay off here
because VGG has no stride-2 7x7 stem to absorb it).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

# (torchvision features index, out_channels) for the 13 convs; maxpools sit
# between blocks.  Block boundaries after convs 2, 4, 7, 10 (2x2/s2 pools).
VGG16_CONVS = (
    (0, 64), (2, 64),
    (5, 128), (7, 128),
    (10, 256), (12, 256), (14, 256),
    (17, 512), (19, 512), (21, 512),
    (24, 512), (26, 512), (28, 512),
)
# convs after which a 2x2/s2 maxpool runs (torchvision indices 4, 9, 16, 23)
_POOL_AFTER = {2, 7, 14, 21}
# the reference's [:-1] slice drops the ReLU after conv 28 (vgg.py:41)
_FINAL_CONV = 28


class VGG16Body(nn.Module):
    """13-conv VGG-16 feature body -> 1-tuple of (H/16, W/16, 512)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        for idx, ch in VGG16_CONVS:
            x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                        name=f"conv{idx}")(x)
            if idx != _FINAL_CONV:
                x = nn.relu(x)
            if idx in _POOL_AFTER:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return (x,)
