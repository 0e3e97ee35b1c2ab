"""Diagnostic PNG plots (reference observability artifacts).

Functional equivalents of the reference's matplotlib dumps:

* ``rel_freq_dist.png`` — per-predicate relation-count bars colored by
  head/body/tail part, optionally two panels (raw counts vs
  post-resampling counts), sorted by descending frequency
  (reference visual_genome.py:236-295 + data/build.py:97-141).
* ``rel_freq_dist2recall-{type}-{n}.png`` — min-max-normalized frequency
  bars overlaid with per-class recall dots, drawn after each evaluation
  (reference vg_eval.py:208-248 ``show_per_cls_performance_and_frequency``).

All functions are headless (Agg backend) and no-op gracefully if
matplotlib is unavailable.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

_PART_COLOR = {"h": "r", "b": "g", "t": "b"}


def _plt():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception:  # pragma: no cover - matplotlib is in the image
        return None


def save_rel_freq_dist(
    names: Sequence[str],
    counts: Sequence[float],
    parts: Sequence[Optional[str]],
    path: str,
    counts_init: Optional[Sequence[float]] = None,
    sort: bool = True,
) -> Optional[str]:
    """Per-predicate frequency bar chart colored by longtail part.

    ``parts[i]`` is 'h'/'b'/'t' for ``names[i]`` (unknown → gray).  With
    ``counts_init`` a second panel shows the pre-resampling distribution
    above the post-resampling one (reference visual_genome.py:279-294's
    two-axes figure); otherwise a single panel (data/build.py:131-141).
    Returns the written path, or None when matplotlib is missing.
    """
    plt = _plt()
    if plt is None:
        return None
    names = list(names)
    counts = np.asarray(counts, np.float64)
    parts = list(parts)
    if sort:
        order = np.argsort(-(counts_init if counts_init is not None
                             else counts), kind="stable")
        order = np.asarray(order)
        names = [names[i] for i in order]
        counts = counts[order]
        parts = [parts[i] for i in order]
        if counts_init is not None:
            counts_init = np.asarray(counts_init, np.float64)[order]
    colors = [_PART_COLOR.get(p, "gray") for p in parts]

    if counts_init is not None:
        fig, axs = plt.subplots(2, 1, figsize=(13, 10), tight_layout=True)
        fig.set_facecolor((1, 1, 1))
        axs[0].bar(names, np.asarray(counts_init, np.float64),
                   color=colors, width=0.6, zorder=0)
        axs[0].grid()
        axs[0].tick_params(axis="x", rotation=-90)
        axs[1].bar(names, counts, color=colors, width=0.6, zorder=0)
        axs[1].grid()
        axs[1].set_ylim(0, max(50000.0, float(counts.max() or 1)))
        axs[1].tick_params(axis="x", rotation=-90)
    else:
        fig, ax = plt.subplots(1, 1, figsize=(16, 5), tight_layout=True)
        fig.set_facecolor((1, 1, 1))
        ax.bar(names, counts, color=colors)
        ax.grid()
        ax.set_ylim(0, max(50000.0, float(counts.max() or 1)))
        ax.tick_params(axis="x", rotation=-60)
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path


def save_freq_to_recall(
    names: Sequence[str],
    freq: Sequence[float],
    recall: Sequence[float],
    parts: Sequence[Optional[str]],
    path: str,
) -> Optional[str]:
    """Min-max-normalized frequency bars + per-class recall scatter
    (reference vg_eval.py:214-248).  Classes ordered head→body→tail, each
    part internally sorted by descending frequency like the reference's
    HEAD/BODY/TAIL iteration."""
    plt = _plt()
    if plt is None:
        return None
    freq = np.asarray(freq, np.float64)
    recall = np.asarray(recall, np.float64)
    order: list = []
    for part in ("h", "b", "t"):
        idx = [i for i, p in enumerate(parts) if p == part]
        idx.sort(key=lambda i: -freq[i])
        order.extend(idx)
    order.extend(i for i, p in enumerate(parts)
                 if p not in ("h", "b", "t"))
    names = [names[i] for i in order]
    colors = [_PART_COLOR.get(parts[i], "gray") for i in order]
    f = freq[order]
    # reference min_max_norm: (x - min) / max
    f = (f - f.min()) / max(float(f.max()), 1e-10)

    fig, ax = plt.subplots(1, 1, figsize=(13, 5), tight_layout=True)
    fig.set_facecolor((1, 1, 1))
    ax.bar(names, f, color=colors, width=0.6, zorder=0)
    ax.scatter(names, recall[order], color="k", zorder=10)
    ax.grid()
    ax.tick_params(axis="x", rotation=-90)
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path


def eval_plots_from_aggregate(
    agg: Dict,
    predicate_names: Sequence[str],
    predicate_counts: Sequence[float],
    parts: Sequence[Optional[str]],
    out_dir: str,
    mode: str,
    eval_index: int,
    k: int = 100,
) -> Optional[str]:
    """Draw the per-eval frequency→recall PNG from an ``SGGEvaluator``
    aggregate (uses ``mR_per_class[k]``; predicate index i+1 ↔ list index
    i, the reference's off-by-one).  Returns the path or None."""
    import os

    per_class = (agg.get("mR_per_class") or {}).get(k)
    if per_class is None:
        return None
    # predicate 0 is background: names/counts/parts are indexed by
    # predicate id, per_class by id-1
    names = [predicate_names[i + 1] for i in range(len(per_class))]
    freq = [predicate_counts[i + 1] for i in range(len(per_class))]
    pp = [parts[i + 1] for i in range(len(per_class))]
    path = os.path.join(
        out_dir, f"rel_freq_dist2recall-{mode}-{eval_index}.png")
    return save_freq_to_recall(names, freq, per_class, pp, path)
