"""Padded, fixed-shape box containers.

The reference carries per-image detections in a dynamic ``BoxList``
(pysgg/structures/bounding_box.py:9) with arbitrary named fields.  Dynamic
shapes defeat XLA, so the TPU rebuild uses a pytree of fixed-size arrays plus
a validity mask: every stage (proposals → detections → pairs) has a static
budget and carries ``mask`` to mark real entries.

``BoxArray`` is deliberately thin — box math lives in
:mod:`veto_tpu.ops.box_ops` as pure functions so it composes with
jit/vmap/shard_map.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class BoxArray:
    """A fixed-size set of ``xyxy`` boxes with a validity mask and fields.

    Attributes:
      boxes: (..., N, 4) float array in xyxy pixel coordinates.
      mask:  (..., N) bool array; True for real boxes, False for padding.
      size:  (..., 2) int array holding (width, height) of the image each
             box set lives in (reference BoxList.size).
      fields: dict of per-box arrays with leading shape (..., N, ...).
    """

    boxes: jnp.ndarray
    mask: jnp.ndarray
    size: jnp.ndarray
    fields: Dict[str, jnp.ndarray] = struct.field(default_factory=dict)

    @property
    def capacity(self) -> int:
        return self.boxes.shape[-2]

    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)

    def get(self, name: str) -> jnp.ndarray:
        return self.fields[name]

    def has(self, name: str) -> bool:
        return name in self.fields

    def with_field(self, name: str, value: jnp.ndarray) -> "BoxArray":
        new_fields = dict(self.fields)
        new_fields[name] = value
        return self.replace(fields=new_fields)

    def with_fields(self, **kv) -> "BoxArray":
        new_fields = dict(self.fields)
        new_fields.update(kv)
        return self.replace(fields=new_fields)


def pad_boxes(
    boxes: np.ndarray,
    capacity: int,
    size: Tuple[int, int],
    fields: Optional[Dict[str, np.ndarray]] = None,
    dtype: Any = np.float32,
) -> BoxArray:
    """Host-side helper: pad an (n, 4) numpy box array to a fixed capacity.

    Used by the input pipeline to produce compile-once shapes.  Extra entries
    are zero boxes with mask=False.  Raises if n exceeds capacity — callers
    must pre-truncate with their stage budget.
    """
    n = boxes.shape[0]
    if n > capacity:
        raise ValueError(f"{n} boxes exceed capacity {capacity}; truncate first")
    out = np.zeros((capacity, 4), dtype=dtype)
    out[:n] = boxes
    mask = np.zeros((capacity,), dtype=bool)
    mask[:n] = True
    padded_fields = {}
    for name, val in (fields or {}).items():
        val = np.asarray(val)
        buf = np.zeros((capacity,) + val.shape[1:], dtype=val.dtype)
        buf[:n] = val
        padded_fields[name] = buf
    return BoxArray(
        boxes=jnp.asarray(out),
        mask=jnp.asarray(mask),
        size=jnp.asarray(np.array(size, dtype=np.int32)),
        fields={k: jnp.asarray(v) for k, v in padded_fields.items()},
    )
