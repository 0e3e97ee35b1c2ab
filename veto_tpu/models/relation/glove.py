"""GloVe word-vector loading for object-class embeddings.

Re-design of obj_edge_vectors (reference utils_motifs.py:151-180): reads
``glove.6B.<dim>d.txt`` from a configured directory, matches class names
token-wise (multi-word names average their tokens, like the reference's
fallback chain name → first token), and fills misses with N(0, 1) — the
reference's torch default embedding init.  Returns a (num_classes, dim)
float32 array used to initialize nn.Embed tables.

No network access: when ``glove_dir`` is empty or the file is missing the
whole table is the deterministic random fallback (seeded), which keeps
training runnable; point ``Config.glove_dir`` at a real GloVe dump for
paper-parity embeddings.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Sequence

import numpy as np


@lru_cache(maxsize=4)
def _load_glove(path: str):
    vocab = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip().split(" ")
            vocab[parts[0]] = np.asarray(parts[1:], dtype=np.float32)
    return vocab


def obj_edge_vectors(
    names: Sequence[str], glove_dir: str = "", dim: int = 200, seed: int = 0
) -> np.ndarray:
    rng = np.random.RandomState(seed)
    out = rng.randn(len(names), dim).astype(np.float32)
    path = os.path.join(glove_dir, f"glove.6B.{dim}d.txt") if glove_dir else ""
    if not path or not os.path.exists(path):
        return out
    vocab = _load_glove(path)
    for i, name in enumerate(names):
        tokens = name.replace("__", "").replace("_", " ").split()
        vecs = [vocab[t] for t in tokens if t in vocab]
        if vecs:
            out[i] = np.mean(vecs, axis=0)
    return out
