"""Global debug buffer — host-side re-design of the reference's
``pysgg/utils/global_buffer.py:19-63``.

The reference buffer is a process-wide singleton that any module can call
mid-forward (``store_data``), all-gathering each tensor over NCCL and
pickling the accumulated dict at the end of the run
(``inter_data_buffer.pkl``).  Its only production caller is the relation
proposal network, which stores train/test relness targets + scores for
offline AP/AUC diagnostics
(``rel_proposal_network/models.py:346-356``).

Under jit there is no "anywhere in the program" host hook, so the
TPU-native design moves collection to the jit boundary: train/eval steps
return the diagnostic arrays (padded, with their validity mask) as an
auxiliary ``buffer`` entry in their metrics dict, and the host loop feeds
them here.  Multi-host runs ride ``engine.gather.pad_allgather`` (the XLA
analog of the reference's ``all_gather``); only process 0 keeps data.
"""

from __future__ import annotations

import os
import pickle
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

_BUFFER: Optional["_GlobalBuffer"] = None


class _GlobalBuffer:
    def __init__(self):
        self.data: Dict[str, List[np.ndarray]] = defaultdict(list)
        self.enabled = False

    def __str__(self) -> str:
        lines = ["Buffer contains data: (key, entries, total rows)"]
        for k, v in self.data.items():
            lines.append(f"    {k}, {len(v)}, {sum(len(a) for a in v)}")
        return "\n".join(lines)


def _buffer() -> _GlobalBuffer:
    global _BUFFER
    if _BUFFER is None:
        _BUFFER = _GlobalBuffer()
    return _BUFFER


def enable(on: bool = True) -> None:
    """Turn collection on/off (the reference's ``cfg.GLOBAL_BUFFER_ON``)."""
    _buffer().enabled = on


def reset() -> None:
    global _BUFFER
    _BUFFER = None


def store_data(key: str, val, mask=None) -> None:
    """Append ``val`` (any array-like; device arrays are fetched) under
    ``key``.  ``mask`` drops padded rows before storing.  Multi-host, the
    value is all-gathered and only process 0 keeps it
    (global_buffer.py:27-38).
    """
    buf = _buffer()
    if not buf.enabled:
        return
    arr = np.asarray(val)
    if mask is not None:
        arr = arr[np.asarray(mask).astype(bool)]
    arr = arr.reshape(len(arr), -1) if arr.ndim else arr.reshape(1, 1)

    import jax

    if jax.process_count() > 1:
        from veto_tpu.engine.gather import pad_allgather

        parts = pad_allgather(arr)
        if jax.process_index() != 0:
            return
        arr = np.concatenate(parts, axis=0)
    buf.data[key].append(arr)


def save_buffer(output_dir: str) -> Optional[str]:
    """Pickle the accumulated dict to ``inter_data_buffer.pkl``
    (global_buffer.py:55-62).  Returns the path written, or None."""
    buf = _buffer()
    if not buf.enabled or not buf.data:
        return None

    import jax

    if jax.process_index() != 0:
        return None
    path = os.path.join(output_dir, "inter_data_buffer.pkl")
    with open(path, "wb") as f:
        pickle.dump({k: list(v) for k, v in buf.data.items()}, f)
    return path
