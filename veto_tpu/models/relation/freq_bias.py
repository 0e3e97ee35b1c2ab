"""Frequency bias: P(predicate | subj class, obj class) prior.

Re-design of FrequencyBias (reference model_motifs.py:14-56): an embedding
over (subj, obj) class pairs initialized to log pred_dist from the dataset
statistics (data/build.py get_dataset_statistics → pred_dist), trainable like
the reference's nn.Embedding.  Used by Motifs/IMP/VCTree-style predictors and
by GLOBAL_SETTING.USE_BIAS.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class FrequencyBias(nn.Module):
    """log-pred_dist lookup keyed by the (subj, obj) class pair."""

    num_obj_classes: int = 151
    num_rel_classes: int = 51
    # (num_obj, num_obj, num_rel) statistics['pred_dist']; None → zero init
    pred_dist: Optional[np.ndarray] = None
    dtype: Any = jnp.float32

    def setup(self):
        n = self.num_obj_classes

        def init(key, shape, dtype=jnp.float32):
            if self.pred_dist is None:
                return jnp.zeros(shape, dtype)
            table = np.log(np.asarray(self.pred_dist, np.float64) + 1e-12)
            return jnp.asarray(table.reshape(n * n, self.num_rel_classes), dtype)

        self.obj_baseline = self.param(
            "obj_baseline", init, (n * n, self.num_rel_classes)
        )

    def __call__(self, pair_labels: jnp.ndarray) -> jnp.ndarray:
        """pair_labels (..., 2) int → (..., num_rel) bias logits."""
        n = self.num_obj_classes
        idx = pair_labels[..., 0].astype(jnp.int32) * n + pair_labels[..., 1].astype(jnp.int32)
        return jnp.take(self.obj_baseline, idx, axis=0).astype(jnp.float32)

    def index_with_probability(self, pair_prob: jnp.ndarray) -> jnp.ndarray:
        """Soft lookup (model_motifs.py:41-51): the joint subject/object
        probability contracted with the bias table.

        pair_prob: (..., num_obj, 2) — softmax class distributions of the
        subject (channel 0) and object (channel 1).
        """
        n = self.num_obj_classes
        w = self.obj_baseline.reshape(n, n, self.num_rel_classes).astype(jnp.float32)
        ps = pair_prob[..., 0].astype(jnp.float32)
        po = pair_prob[..., 1].astype(jnp.float32)
        return jnp.einsum("...s,sor,...o->...r", ps, w, po)
