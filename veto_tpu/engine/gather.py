"""Multi-host evaluation gather.

The reference gathers per-batch prediction BoxLists to rank 0 through a
pickle-based NCCL all_gather (comm.py:48-96, SYNC_GATHER
engine/inference.py:49-58).  Ragged pickled objects have no XLA
equivalent, so the TPU rebuild gathers the *evaluator state* instead:
every host feeds its own shard of images into a local SGGEvaluator, whose
accumulated per-image statistics are flat float lists — these pad to the
max host length and ride `multihost_utils.process_allgather`, then merge
into one evaluator on every host.  Mathematically identical to rank-0
evaluation of all predictions: each metric is a mean over per-image
values (mR: per-class lists concatenate before the class mean).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

import jax


def pad_allgather(arr: np.ndarray) -> List[np.ndarray]:
    """All-gather a 1-D float array with per-host lengths.

    Lengths are exchanged first, payloads padded with NaN to the max
    (the reference pads pickled byte tensors to the max size the same way,
    comm.py:69-86).  Returns the per-host arrays, trimmed.
    Single-process: returns ``[arr]`` without touching the device.
    """
    arr = np.asarray(arr, np.float64).reshape(-1)
    if jax.process_count() == 1:
        return [arr]
    from jax.experimental import multihost_utils

    lengths = np.asarray(
        multihost_utils.process_allgather(np.asarray([len(arr)]))
    ).reshape(-1)
    max_len = int(lengths.max())
    padded = np.full(max_len, np.nan)
    padded[: len(arr)] = arr
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(jax.process_count(), max_len)
    return [gathered[i, : int(lengths[i])] for i in range(jax.process_count())]


def _evaluator_blob(ev) -> Dict[str, np.ndarray]:
    """Flatten an SGGEvaluator's accumulated lists into named 1-D arrays."""
    blob: Dict[str, np.ndarray] = {"num_images": np.asarray([ev.num_images])}
    for k in ev.ks:
        blob[f"recall/{k}"] = np.asarray(ev.recall[k])
        blob[f"ng/{k}"] = np.asarray(ev.recall_nogc[k])
        blob[f"zs/{k}"] = np.asarray(ev.zeroshot_recall[k])
        blob[f"acc_hit/{k}"] = np.asarray(ev.accuracy_hit[k])
        blob[f"acc_cnt/{k}"] = np.asarray(ev.accuracy_count[k])
        blob[f"ar_hit/{k}"] = np.asarray(ev.acc_recall_hit[k])
        blob[f"ar_cnt/{k}"] = np.asarray(ev.acc_recall_count[k])
        for c in range(ev.num_rel):
            blob[f"mr/{k}/{c}"] = np.asarray(ev.mean_recall_collect[k][c])
            blob[f"ngmr/{k}/{c}"] = np.asarray(ev.ng_mean_recall_collect[k][c])
    return blob


def _load_blobs(ev, blobs: List[Dict[str, np.ndarray]]) -> None:
    """Replace ``ev``'s state with the concatenation of host blobs."""
    ev.reset()
    ev.num_images = int(sum(b["num_images"][0] for b in blobs))
    for k in ev.ks:
        ev.recall[k] = list(np.concatenate([b[f"recall/{k}"] for b in blobs]))
        ev.recall_nogc[k] = list(np.concatenate([b[f"ng/{k}"] for b in blobs]))
        ev.zeroshot_recall[k] = list(np.concatenate([b[f"zs/{k}"] for b in blobs]))
        ev.accuracy_hit[k] = list(np.concatenate([b[f"acc_hit/{k}"] for b in blobs]))
        ev.accuracy_count[k] = list(np.concatenate([b[f"acc_cnt/{k}"] for b in blobs]))
        ev.acc_recall_hit[k] = list(np.concatenate([b[f"ar_hit/{k}"] for b in blobs]))
        ev.acc_recall_count[k] = list(np.concatenate([b[f"ar_cnt/{k}"] for b in blobs]))
        for c in range(ev.num_rel):
            ev.mean_recall_collect[k][c] = list(
                np.concatenate([b[f"mr/{k}/{c}"] for b in blobs])
            )
            ev.ng_mean_recall_collect[k][c] = list(
                np.concatenate([b[f"ngmr/{k}/{c}"] for b in blobs])
            )


def merge_evaluators(target, sources) -> None:
    """In-process merge (the degenerate single-host form of the gather;
    also the unit-testable core)."""
    blobs = [_evaluator_blob(e) for e in sources]
    _load_blobs(target, blobs)


def sync_gather_evaluator(ev) -> None:
    """Merge every host's evaluator state into ``ev``, in place.

    The multi-host replacement for the reference's
    _accumulate_predictions_from_multiple_gpus (inference.py:62-90); after
    this call every host holds identical global metrics (the reference
    leaves them on rank 0 only).  No-op on a single process.
    """
    if jax.process_count() == 1:
        return
    local = _evaluator_blob(ev)
    keys = sorted(local)
    gathered: List[Dict[str, np.ndarray]] = [
        {} for _ in range(jax.process_count())
    ]
    for key in keys:
        for host, part in enumerate(pad_allgather(local[key])):
            gathered[host][key] = part
    _load_blobs(ev, gathered)
