"""Loss layers from the reference L1 layer package (pysgg/layers/).

All are pure-jnp expressions — on TPU XLA fuses them, so the CUDA focal-loss
kernel (csrc/cuda/SigmoidFocalLoss_cuda.cu) needs no Pallas counterpart:
the elementwise math is bandwidth-trivial next to the matmuls it feeds.

  * :func:`sigmoid_focal_loss` — layers/sigmoid_focal_loss.py:40-58 (the CPU
    reference path; the CUDA kernel computes the same expression).
  * :func:`smooth_l1_loss` — layers/smooth_l1_loss.py:6-16.
  * :func:`entropy_loss` / :func:`kl_div_loss` — layers/entropy_loss.py,
    kl_div_loss.py.
  * :func:`label_smoothing_ce` — layers/label_smoothing_loss.py
    Label_Smoothing_Regression.
  * :class:`LearnableBalancedNorm` — layers/balanced_norm.py
    LearnableBalancedNorm1d (learnable per-class labeling probability that
    renormalizes relation softmax outputs).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def sigmoid_focal_loss(
    logits: jnp.ndarray,   # (N, C) — class c logit at column c-1 (no bg col)
    targets: jnp.ndarray,  # (N,) int labels, 0 = background
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> jnp.ndarray:
    """Per-element focal loss, summed over classes like the reference
    kernel; reduce at the call site (SigmoidFocalLoss.forward sums)."""
    n, c = logits.shape
    class_range = jnp.arange(1, c + 1)[None, :]
    t = targets[:, None]
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    eps = 1e-12
    term1 = (1 - p) ** gamma * jnp.log(p + eps)
    term2 = p ** gamma * jnp.log(jnp.clip(1 - p, eps))
    pos = (t == class_range).astype(jnp.float32)
    neg = ((t != class_range) & (t >= 0)).astype(jnp.float32)
    return -pos * term1 * alpha - neg * term2 * (1 - alpha)


def smooth_l1_loss(
    inp: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0 / 9,
    size_average: bool = True,
) -> jnp.ndarray:
    n = jnp.abs(inp - target)
    loss = jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)
    return loss.mean() if size_average else loss.sum()


def entropy_loss(p: jnp.ndarray, e: float = 1e-9, reduction: str = "sum") -> jnp.ndarray:
    """Mean (over rows) entropy of given probability rows."""
    loss = -(p * jnp.log(p + e))
    loss = loss.sum(-1) if reduction == "sum" else loss.mean(-1)
    return loss.mean()


def kl_div_loss(p: jnp.ndarray, q: jnp.ndarray, e: float = 1e-9,
                reduction: str = "sum") -> jnp.ndarray:
    """KL(q || p) with the reference's stop-gradient on the target q."""
    q = jax.lax.stop_gradient(q)
    loss = q * (jnp.log(q + e) - jnp.log(p + e))
    loss = loss.sum(-1) if reduction == "sum" else loss.mean(-1)
    return loss.mean()


def label_smoothing_ce(
    logits: jnp.ndarray, targets: jnp.ndarray, e: float = 0.01,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Label_Smoothing_Regression: CE against (1-e)-hot + e/C smoothing."""
    c = logits.shape[-1]
    smooth = jax.nn.one_hot(targets, c) * (1.0 - e) + e / c
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -(smooth * logp).sum(-1)
    if mask is not None:
        w = mask.astype(jnp.float32)
        return (nll * w).sum() / jnp.maximum(w.sum(), 1.0)
    return nll.mean()


class LearnableBalancedNorm(nn.Module):
    """LearnableBalancedNorm1d (balanced_norm.py:6-37): divides the relation
    softmax by a learnable per-class labeling probability (bg fixed at 1)."""

    num_fg_classes: int = 50
    eps: float = 1e-5
    normalized_probs: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, relation_logits: jnp.ndarray) -> jnp.ndarray:
        theta = self.param(
            "labeling_prob_theta", nn.initializers.normal(1.0),
            (self.num_fg_classes,), jnp.float32,
        )
        prob = jnp.concatenate(
            [jnp.ones((1,)), jax.nn.sigmoid(theta)]
        ) + self.eps
        norm = jax.nn.softmax(relation_logits.astype(jnp.float32), -1) / prob
        if self.normalized_probs:
            norm = norm.at[..., 0].set(1.0 - norm[..., 1:].sum(-1))
        return norm


def ldam_margins(counts, max_m: float = 0.5):
    """Per-class LDAM margins from training counts (loss.py LDAMLoss
    :313-318): m_c = 1/c^(1/4), rescaled so max(m) == max_m."""
    import numpy as np

    m = 1.0 / np.sqrt(np.sqrt(np.asarray(counts, np.float64)))
    m = m * (max_m / np.max(m))
    return m.astype(np.float32)


def ldam_loss(
    logits: jnp.ndarray,       # (..., C)
    labels: jnp.ndarray,       # (...,) int
    mask: jnp.ndarray,         # (...,) bool
    margins: jnp.ndarray,      # (C,) from ldam_margins
    s: float = 30.0,
    class_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Label-distribution-aware-margin CE (reference loss.py:311-333):
    subtract the target class's margin from its logit, then weighted CE on
    the scaled logits."""
    safe = jnp.where(mask, labels, 0)
    onehot = jax.nn.one_hot(safe, logits.shape[-1], dtype=jnp.float32)
    x = logits.astype(jnp.float32) - onehot * margins[safe][..., None]
    logp = jax.nn.log_softmax(s * x, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if class_weights is None:
        w = mask.astype(jnp.float32)
    else:
        w = jnp.where(mask, class_weights[safe], 0.0)
    return (nll * w).sum() / jnp.maximum(w.sum(), 1e-6)


def balanced_norm_probs(
    logits: jnp.ndarray,        # (..., C) relation logits
    labels: jnp.ndarray,        # (...,) int, train only
    mask: jnp.ndarray,          # (...,) bool
    running_prob: jnp.ndarray,  # (C,) running labeling probability
    momentum: float = 0.1,
    eps: float = 1e-5,
    train: bool = False,
    normalized_probs: bool = False,
):
    """Running-stats BalancedNorm1d (layers/balanced_norm.py:38-140).

    At train time the per-class "labeling probability" — the mean softmax
    mass the model puts on the TRUE class among foreground samples — is
    tracked with an EMA (bg pinned at 1); predictions are re-normalized by
    it.  Returns (probs_norm, new_running_prob); the update carries no
    gradient (with_gradient=False, relation_head.py:61-62).
    """
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    new_prob = running_prob
    if train:
        fg = (mask & (labels > 0)).astype(jnp.float32).reshape(-1)
        flat_p = probs.reshape(-1, probs.shape[-1])
        safe = jnp.where(mask, labels, 0).reshape(-1)
        onehot = jax.nn.one_hot(safe, probs.shape[-1], dtype=jnp.float32)
        onehot = onehot * fg[:, None]
        per_class_mass = (flat_p * onehot).sum(0)
        per_class_cnt = onehot.sum(0)
        batch_prob = per_class_mass / jnp.maximum(per_class_cnt, 1.0)
        seen = per_class_cnt > 0  # NaN-skip in the reference (:121-127)
        new_prob = jnp.where(
            seen, momentum * batch_prob + (1 - momentum) * running_prob,
            running_prob,
        )
        new_prob = new_prob.at[0].set(1.0)  # bg labeling prob is always one
        new_prob = jax.lax.stop_gradient(new_prob)
    probs_norm = probs / (new_prob + eps)
    if normalized_probs:
        probs_norm = probs_norm.at[..., 0].set(1.0 - probs_norm[..., 1:].sum(-1))
    return probs_norm, new_prob


def balanced_norm_nll(
    probs_norm: jnp.ndarray,
    labels: jnp.ndarray,
    mask: jnp.ndarray,
    class_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """torch nn.NLLLoss(weight) applied to the re-normalized probabilities
    (the reference's loss_relation_balanced_norm construction, loss.py:77-78
    — note the reference feeds probabilities, not log-probabilities; we
    take log for a proper likelihood while keeping the weighting scheme)."""
    safe = jnp.where(mask, labels, 0)
    logp = jnp.log(jnp.clip(probs_norm, 1e-12))
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if class_weights is None:
        w = mask.astype(jnp.float32)
    else:
        w = jnp.where(mask, class_weights[safe], 0.0)
    return (nll * w).sum() / jnp.maximum(w.sum(), 1e-6)
