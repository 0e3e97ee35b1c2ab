"""Checkpoint save/load with resume.

Replaces the reference Checkpointer/DetectronCheckpointer
(pysgg/utils/checkpoint.py:13-177): saves params + batch_stats + optimizer
state + LR-controller state + iteration, keeps a ``last_checkpoint`` pointer
file, and restores the full TrainState for exact resume.  Orbax handles the
array serialization (the jax-native replacement for torch.save) and is
multi-host safe.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 5):
        self.directory = os.path.abspath(directory)
        self.keep = keep
        os.makedirs(self.directory, exist_ok=True)
        import orbax.checkpoint as ocp

        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
        )

    # ------------------------------------------------------------------
    def save(self, step: int, state, extra: Optional[Dict[str, Any]] = None) -> None:
        """Persist a TrainState (+ host-side extras, e.g. LRController)."""
        import orbax.checkpoint as ocp

        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
            "rng": np.asarray(state.rng),
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()
        if extra is not None:
            with open(os.path.join(self.directory, f"extra_{step}.json"), "w") as f:
                json.dump(extra, f)
        # reference keeps a `last_checkpoint` pointer (checkpoint.py:110-129)
        with open(os.path.join(self.directory, "last_checkpoint"), "w") as f:
            f.write(str(step))

    # ------------------------------------------------------------------
    def latest_step(self) -> Optional[int]:
        pointer = os.path.join(self.directory, "last_checkpoint")
        if os.path.exists(pointer):
            with open(pointer) as f:
                return int(f.read().strip())
        return self._mgr.latest_step()

    def restore(self, state, step: Optional[int] = None):
        """Restore into the structure of ``state``; returns (state, extra)."""
        import orbax.checkpoint as ocp

        step = step if step is not None else self.latest_step()
        if step is None:
            return state, None
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
            "rng": np.asarray(state.rng),
        }
        payload = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        extra = None
        extra_path = os.path.join(self.directory, f"extra_{step}.json")
        if os.path.exists(extra_path):
            with open(extra_path) as f:
                extra = json.load(f)
        new_state = state.replace(
            params=payload["params"],
            batch_stats=payload["batch_stats"],
            opt_state=payload["opt_state"],
            step=jax.numpy.asarray(payload["step"]),
            rng=jax.numpy.asarray(payload["rng"]),
        )
        return new_state, extra


def load_params_partially(params, loaded, log=print):
    """Merge matching leaves from ``loaded`` into ``params`` by path,
    logging mismatches — the reference's load_weight_partially
    (checkpoint.py:81-108)."""
    paths_p = {tuple(str(getattr(k, "key", k)) for k in path): (path, leaf)
               for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]}
    paths_l = {tuple(str(getattr(k, "key", k)) for k in path): leaf
               for path, leaf in jax.tree_util.tree_flatten_with_path(loaded)[0]}
    out = {}
    for key, (path, leaf) in paths_p.items():
        if key in paths_l and paths_l[key].shape == leaf.shape:
            out[key] = paths_l[key]
        else:
            log(f"checkpoint: no match for {'/'.join(key)}, keeping init")
            out[key] = leaf
    leaves = [out[tuple(str(getattr(k, "key", k)) for k in path)]
              for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(params), leaves)
