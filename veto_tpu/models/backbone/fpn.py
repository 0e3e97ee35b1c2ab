"""Feature Pyramid Network (pysgg/modeling/backbone/fpn.py:7-99), NHWC.

Lateral 1x1 convs + nearest x2 top-down + 3x3 output convs, plus
LastLevelMaxPool producing P6 (fpn.py:77).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


def _upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour x2 (reference F.interpolate(scale_factor=2))."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPN(nn.Module):
    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        """inputs: (C2, C3, C4, C5) finest-first.  Returns (P2..P6)."""
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name=f"fpn_inner{i + 1}")(c)
            for i, c in enumerate(inputs)
        ]
        # top-down accumulation, coarsest first
        merged = [laterals[-1]]
        for lat in reversed(laterals[:-1]):
            top = _upsample_nearest_2x(merged[0])
            # crop in case of odd input sizes (reference sizes are always
            # divisible by SIZE_DIVISIBILITY=32, so this is a no-op there)
            top = top[:, : lat.shape[1], : lat.shape[2], :]
            merged.insert(0, lat + top)
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"fpn_layer{i + 1}")(m)
            for i, m in enumerate(merged)
        ]
        # LastLevelMaxPool: P6 = maxpool(P5, 1x1 kernel, stride 2)
        p6 = nn.max_pool(outs[-1], (1, 1), strides=(2, 2))
        return tuple(outs) + (p6,)
