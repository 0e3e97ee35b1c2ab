"""Dataset-derived predicate frequency constants and MEET group splits.

These are *data facts* about Visual Genome / GQA-200 (training-set predicate
frequencies and the frequency-sorted relabeling built from them), reproduced
from the reference so that REORDER_FREQ_BASED datasets, the Rwt beta loss,
and the MEET group routing are numerically identical
(reference SHA_GCL_extra/group_chosen_function.py:2-94,
SHA_GCL_extra/extra_function_utils.py:111-133, pred_counts.pkl).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

# old predicate id → frequency-rank id (descending train count), VG 51 classes
VG_PREDICATE_NEW_ORDER = [
    0, 10, 42, 43, 34, 28, 17, 19, 7, 29, 33, 18, 35, 32, 27, 50, 22, 44, 45,
    25, 2, 9, 5, 15, 26, 23, 37, 48, 41, 6, 4, 1, 38, 21, 46, 30, 36, 47, 14,
    49, 11, 16, 39, 13, 31, 40, 20, 24, 3, 12, 8,
]

# training-sample count per frequency-ranked predicate (index 0 = background)
VG_PREDICATE_COUNTS = [
    3024465, 109355, 67144, 47326, 31347, 21748, 15300, 10011, 11059, 10764,
    6712, 5086, 4810, 3757, 4260, 3167, 2273, 1829, 1603, 1413, 1225, 793,
    809, 676, 352, 663, 752, 565, 504, 644, 601, 551, 460, 394, 379, 397,
    429, 364, 333, 299, 270, 234, 171, 208, 163, 157, 151, 71, 114, 44, 4,
]

# frequency-ranked predicate names
VG_PREDICATE_NAMES = [
    "__background__", "on", "has", "wearing", "of", "in", "near", "behind",
    "with", "holding", "above", "sitting on", "wears", "under", "riding",
    "in front of", "standing on", "at", "carrying", "attached to",
    "walking on", "over", "for", "looking at", "watching", "hanging from",
    "laying on", "eating", "and", "belonging to", "parked on", "using",
    "covering", "between", "along", "covered in", "part of", "lying on",
    "on back of", "to", "walking in", "mounted on", "across", "against",
    "from", "growing on", "painted on", "playing", "made of", "says",
    "flying in",
]

GQA_PREDICATE_COUNTS = [
    200000, 64218, 47205, 32126, 25203, 21104, 15890, 15676, 7688, 6966,
    6596, 6044, 5250, 4260, 4180, 4131, 2859, 2559, 2368, 2351, 2134, 1673,
    1532, 1373, 1273, 1175, 1139, 1123, 1077, 941, 916, 849, 835, 808, 782,
    767, 628, 603, 569, 540, 494, 416, 412, 412, 398, 395, 394, 390, 345,
    327, 302, 301, 292, 275, 270, 267, 267, 264, 258, 251, 233, 233, 229,
    224, 215, 214, 209, 204, 198, 195, 192, 191, 185, 181, 176, 158, 158,
    154, 151, 148, 143, 136, 131, 130, 130, 128, 127, 125, 124, 124, 121,
    118, 112, 112, 106, 105, 104, 103, 102, 52, 52,
]

# MEET / GCL incremental group splits over frequency-ranked predicate ids
# (group_chosen_function.py:6-94).  Each entry: split name → list of
# incremental groups (each group is the UNION of all predicates up to that
# stage in the reference's "incremental" formulation).
_VG_SPLITS = {
    "divide3": [3, 3, 8, 6, 20, 10],
    "divide4": [4, 6, 9, 19, 12],
    "divide3new": [8, 17, 25],
    "divide7new": [2, 4, 5, 6, 8, 10, 15],
    "divide5": [4, 8, 10, 28],
    "average": [10, 10, 10, 10, 10],
}
_GQA_SPLITS = {
    "divide3": [4, 4, 11, 16, 31, 34],
    "divide4": [5, 10, 20, 65],
    "divide5": [7, 14, 28, 51],
    "average": [20, 20, 20, 20, 20],
}


def get_group_splits(dataset: str, split_name: str) -> Tuple[List[List[int]], List[int]]:
    """Frequency-ordered predicate-id groups + per-group sizes.

    Returns (incremental_stage_list, predicate_stage_count) with identical
    values to the reference get_group_splits (group_chosen_function.py:6-94):
    consecutive id ranges over the frequency-sorted vocabulary.
    """
    table = {"VG": _VG_SPLITS, "GQA": _GQA_SPLITS}[dataset]
    sizes = table[split_name]
    groups, start = [], 1
    for s in sizes:
        groups.append(list(range(start, start + s)))
        start += s
    return groups, list(sizes)


def predicate_counts(dataset: str) -> np.ndarray:
    return np.asarray(
        {"VG": VG_PREDICATE_COUNTS, "GQA": GQA_PREDICATE_COUNTS}[dataset],
        dtype=np.int64,
    )


def reorder_predicates(predicates: np.ndarray) -> np.ndarray:
    """Map VG predicate ids to frequency-rank ids (load_graphs reorder path,
    visual_genome.py:616-629)."""
    lut = np.asarray(VG_PREDICATE_NEW_ORDER, dtype=np.int64)
    return lut[predicates]


def generate_sample_rate_matrix(
    dataset: str, group_sizes: List[int]
) -> np.ndarray:
    """Per-group acceptance rates for MEET's expert routing.

    Matches generate_sample_rate_vector_sep2 (extra_function_utils.py:185-257,
    called with cumulative group ends at roi_relation_predictors.py:3899):
    for group k with frequency-ranked class range (prev, end], the rate of a
    class with train count c is

      * 1.0                          if c <= median(group-k counts)
      * max(median/c, 0.01)          if c >  median  (background: x10 first)
      * later (rarer) classes: 1.0   (their counts never exceed the group max)
    """
    counts = predicate_counts(dataset).astype(np.float64)
    num_classes = len(counts)
    cum_ends = np.cumsum(group_sizes)
    out = np.ones((len(group_sizes), num_classes), dtype=np.float64)
    prev = 0
    for k, end in enumerate(cum_ends):
        med = np.median(counts[prev + 1 : end + 1])
        # background + every class up to this group's end, judged vs med
        for c in range(0, end + 1):
            if counts[c] > med:
                rate = med / counts[c]
                if c == 0:
                    rate *= 10.0
                out[k, c] = max(rate, 0.01)
        # rarer classes beyond the group keep rate 1.0 (counts are sorted
        # descending, so the "> max(num_list1)" branch never fires)
        prev = end
    return out.astype(np.float32)


def incre_idx_list(group_sizes: List[int], num_classes: int) -> np.ndarray:
    """Class id → 1-based group index (0 for background).

    Matches get_current_predicate_idx's incre_idx_list output
    (extra_function_utils.py:39-70).
    """
    out = np.zeros(num_classes, dtype=np.int64)
    start = 1
    for k, size in enumerate(group_sizes):
        out[start : start + size] = k + 1
        start += size
    return out


def generate_group_splits(counts, times: float = 4, min_tail: int = 200):
    """Build MEET/GCL predicate groups for a CUSTOM dataset
    (SHA_GCL_extra/get_your_own_group/get_group_splits.py:5-41).

    ``counts`` are per-predicate training counts in descending frequency
    order (background excluded).  A group runs while each member has at
    least ``head/times`` instances; once the threshold also drops below
    ``min_tail`` the remaining tail stays in one group.  Returns the group
    sizes — the same format as :func:`get_group_splits`'s second output
    (VG divide4 → [4, 6, 9, 19, 12]).
    """
    counts = [int(c) for c in counts]
    if not counts:
        return []
    sizes: List[int] = []
    cur = 0
    head = counts[0]
    end = int(head / times)
    for c in counts:
        if c >= end or end < min_tail:
            cur += 1
        else:
            sizes.append(cur)
            head = c
            end = int(c / times)
            cur = 1
    sizes.append(cur)
    return sizes
