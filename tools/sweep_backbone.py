"""Per-stage backbone timing at flagship shapes (batch 8, 800x1344, bf16).

Times the stem, each residual stage, and the FPN as separately-jitted
programs (cumulative prefixes, differenced) to locate where the frozen
ResNeXt-101-FPN forward spends its ~100 ms.  Used to target the
grouped-conv merge policy and any emitter pathologies.

Usage: python tools/sweep_backbone.py [--batch 8] [--steps 10] [--fold-bn]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from veto_tpu.models.backbone.resnet import (
    Bottleneck, FrozenBatchNorm, ResNetBody, ResNetFPNBackbone, StemConv,
)


class Prefix(nn.Module):
    """Stem + the first `n_stages` residual stages of the flagship body."""

    n_stages: int
    fold_bn: bool = True
    stem_s2d: bool = True
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = StemConv(use_bias=self.fold_bn, s2d=self.stem_s2d,
                     dtype=self.dtype, name="stem_conv")(x)
        if not self.fold_bn:
            x = FrozenBatchNorm(64, self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        blocks = (3, 4, 23, 3)
        bottleneck, out_channels = 256, 256
        for stage_idx in range(self.n_stages):
            for block_idx in range(blocks[stage_idx]):
                stride = 2 if (block_idx == 0 and stage_idx > 0) else 1
                x = Bottleneck(
                    bottleneck_channels=bottleneck, out_channels=out_channels,
                    stride=stride, groups=32, stride_in_1x1=True,
                    fold_bn=self.fold_bn, dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_block{block_idx}",
                )(x)
            bottleneck *= 2
            out_channels *= 2
        return x


def timed(fn, *args, steps=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--hw", default="800x1344")
    ap.add_argument("--fold-bn", action=argparse.BooleanOptionalAction,
                    default=True)
    args = ap.parse_args()
    h, w = (int(v) for v in args.hw.split("x"))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(args.batch, h, w, 3).astype(np.float32))

    out = {}
    prev = 0.0
    for n in range(5):
        m = Prefix(n_stages=n, fold_bn=args.fold_bn)
        v = m.init(jax.random.PRNGKey(0), x[:1])
        f = jax.jit(lambda v, x, m=m: m.apply(v, x))
        ms = timed(f, v, x, steps=args.steps)
        name = "stem" if n == 0 else f"+layer{n}"
        out[name + "_cum_ms"] = round(ms, 2)
        out[name + "_delta_ms"] = round(ms - prev, 2)
        prev = ms
        print(f"{name:>8}: cum {ms:7.2f} ms  delta {out[name + '_delta_ms']:7.2f} ms",
              flush=True)

    full = ResNetFPNBackbone(fold_bn=args.fold_bn, dtype=jnp.bfloat16)
    v = full.init(jax.random.PRNGKey(0), x[:1])
    f = jax.jit(lambda v, x: full.apply(v, x))
    ms = timed(f, v, x, steps=args.steps)
    out["full_fpn_ms"] = round(ms, 2)
    out["fpn_delta_ms"] = round(ms - prev, 2)
    print(f"full+fpn: cum {ms:7.2f} ms  delta {out['fpn_delta_ms']:7.2f} ms")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
