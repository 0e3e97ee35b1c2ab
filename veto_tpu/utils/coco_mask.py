"""Pure-numpy COCO mask API (polygon/RLE codecs).

pycocotools is not available in this environment, but the reference's
segmentation containers depend on three of its primitives
(reference structures/segmentation_mask.py:7,66,329-331):

* ``frPyObjects(polygons, h, w)`` — polygon → RLE (maskApi.c rleFrPoly)
* ``merge(rles)``                 — union of RLEs (maskApi.c rleMerge)
* ``decode(rle)``                 — RLE → binary mask (maskApi.c rleDecode)

This module restates those algorithms in numpy, bit-exact to the C
implementation (including the 5x boundary upsampling and the half-open
column-major run encoding), plus ``encode`` and the compressed-string
codec used by COCO json files.  Everything is host-side preprocessing —
rasterized masks feed the TPU as dense arrays.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Union

import numpy as np

__all__ = [
    "poly_to_rle", "merge_rles", "rle_decode", "rle_encode",
    "rle_to_string", "rle_from_string", "frPyObjects", "polygons_to_mask",
]

Rle = Dict[str, object]  # {"size": [h, w], "counts": np.ndarray[int] | str}


def poly_to_rle(xy: Sequence[float], h: int, w: int) -> Rle:
    """Rasterize one polygon into an uncompressed RLE.

    Bit-exact restatement of maskApi.c ``rleFrPoly``: upsample the
    boundary 5x, walk each edge with the longest-axis DDA, keep the
    column-boundary crossings, downsample them back to pixel space, and
    derive runs from the sorted crossing positions (column-major,
    half-open, XOR parity fill).
    """
    xy = np.asarray(xy, np.float64).reshape(-1, 2)
    k = len(xy)
    scale = 5.0
    # int casts here are C-style truncation toward zero — coords are >= 0
    # in COCO so trunc == floor; keep trunc for exactness on negatives too
    x = np.trunc(scale * xy[:, 0] + 0.5).astype(np.int64)
    y = np.trunc(scale * xy[:, 1] + 0.5).astype(np.int64)
    x = np.append(x, x[0])
    y = np.append(y, y[0])

    us: List[np.ndarray] = []
    vs: List[np.ndarray] = []
    for j in range(k):
        xs, xe, ys, ye = int(x[j]), int(x[j + 1]), int(y[j]), int(y[j + 1])
        dx, dy = abs(xe - xs), abs(ys - ye)
        flip = (dx >= dy and xs > xe) or (dx < dy and ys > ye)
        if flip:
            xs, xe, ys, ye = xe, xs, ye, ys
        if dx >= dy:
            s = (ye - ys) / dx if dx else 0.0
            d = np.arange(dx + 1)
            t = dx - d if flip else d
            us.append(t + xs)
            vs.append(np.trunc(ys + s * t + 0.5).astype(np.int64))
        else:
            s = (xe - xs) / dy if dy else 0.0
            d = np.arange(dy + 1)
            t = dy - d if flip else d
            vs.append(t + ys)
            us.append(np.trunc(xs + s * t + 0.5).astype(np.int64))
    u = np.concatenate(us)
    v = np.concatenate(vs)

    # column-boundary crossings, downsampled to pixel coordinates
    xb: List[int] = []
    yb: List[int] = []
    for j in range(1, len(u)):
        if u[j] == u[j - 1]:
            continue
        xd = float(u[j]) if u[j] < u[j - 1] else float(u[j] - 1)
        xd = (xd + 0.5) / scale - 0.5
        if math.floor(xd) != xd or xd < 0 or xd > w - 1:
            continue
        yd = float(v[j] if v[j] < v[j - 1] else v[j - 1])
        yd = (yd + 0.5) / scale - 0.5
        yd = min(max(yd, 0.0), float(h))
        xb.append(int(xd))
        yb.append(int(math.ceil(yd)))

    a = np.array([xi * h + yi for xi, yi in zip(xb, yb)], np.int64)
    a = np.append(np.sort(a), h * w)
    # XOR parity: runs alternate 0/1 between consecutive crossings
    b = np.empty_like(a)
    b[0] = a[0]
    b[1:] = np.diff(a)
    # maskApi folds zero-length runs into the PREVIOUS run: a zero diff
    # means two crossings coincide (the parity toggles twice), so the next
    # run has the same parity as the previous and is absorbed into it
    bl = b.tolist()
    counts: List[int] = [int(bl[0])]
    j = 1
    while j < len(bl):
        if bl[j] > 0:
            counts.append(int(bl[j]))
            j += 1
        else:
            j += 1
            if j < len(bl):
                counts[-1] += int(bl[j])
                j += 1
    return {"size": [int(h), int(w)], "counts": np.asarray(counts, np.int64)}


def rle_decode(rle: Rle) -> np.ndarray:
    """RLE → (h, w) uint8 mask (column-major runs, first run is zeros)."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        counts = rle_from_string(counts)["counts"] if isinstance(
            counts, str) else rle_from_string(
                {"size": rle["size"], "counts": counts})["counts"]
    counts = np.asarray(counts, np.int64)
    vals = np.zeros(len(counts), np.uint8)
    vals[1::2] = 1
    flat = np.repeat(vals, counts)
    if flat.size < h * w:
        flat = np.concatenate([flat, np.zeros(h * w - flat.size, np.uint8)])
    return flat[: h * w].reshape(w, h).T


def rle_encode(mask: np.ndarray) -> Rle:
    """(h, w) binary mask → uncompressed RLE (column-major)."""
    mask = np.asarray(mask)
    h, w = mask.shape
    flat = mask.T.reshape(-1).astype(np.int8)
    change = np.flatnonzero(np.diff(flat)) + 1
    pos = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(pos)
    if flat.size and flat[0] == 1:  # first run must count zeros
        counts = np.concatenate([[0], counts])
    if not flat.size:
        counts = np.array([0], np.int64)
    return {"size": [int(h), int(w)], "counts": counts.astype(np.int64)}


def merge_rles(rles: List[Rle], intersect: bool = False) -> Rle:
    """Union (or intersection) of RLEs — semantics of maskApi rleMerge.

    Implemented by decode → combine → encode: identical output encoding
    (RLE of a binary mask is canonical), simpler than the run-walk."""
    if not rles:
        return {"size": [0, 0], "counts": np.array([0], np.int64)}
    m = rle_decode(rles[0]).astype(bool)
    for r in rles[1:]:
        n = rle_decode(r).astype(bool)
        m = (m & n) if intersect else (m | n)
    return rle_encode(m.astype(np.uint8))


# --- COCO compressed-string codec (maskApi rleToString / rleFrString) ----

def rle_to_string(rle: Rle) -> str:
    """Uncompressed counts → COCO's LEB128-like signed varint string."""
    counts = np.asarray(rle["counts"], np.int64)
    out = []
    for i, c in enumerate(counts.tolist()):
        x = int(c)
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            ch = x & 0x1F
            x >>= 5
            more = not ((x == 0 and not (ch & 0x10)) or
                        (x == -1 and (ch & 0x10)))
            if more:
                ch |= 0x20
            out.append(chr(ch + 48))
    return "".join(out)


def rle_from_string(rle: Union[Rle, str]) -> Rle:
    """COCO varint string → uncompressed counts."""
    if isinstance(rle, str):
        s, size = rle, None
    else:
        s, size = rle["counts"], rle["size"]
        if isinstance(s, bytes):
            s = s.decode("ascii")
    counts: List[int] = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            ch = ord(s[i]) - 48
            x |= (ch & 0x1F) << (5 * k)
            more = bool(ch & 0x20)
            i += 1
            k += 1
            if not more and (ch & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    out: Rle = {"counts": np.asarray(counts, np.int64)}
    if size is not None:
        out["size"] = list(size)
    return out


def frPyObjects(pyobj, h: int, w: int):
    """pycocotools.mask.frPyObjects equivalent for the shapes the
    reference passes: a list of polygons, a single polygon, or RLE
    dict(s) (which pass through with string counts decoded)."""
    if isinstance(pyobj, dict):
        return rle_from_string(pyobj) | {"size": [h, w]}
    if len(pyobj) and isinstance(pyobj[0], dict):
        return [frPyObjects(o, h, w) for o in pyobj]
    if len(pyobj) and isinstance(pyobj[0], (list, tuple, np.ndarray)):
        return [poly_to_rle(p, h, w) for p in pyobj]
    return poly_to_rle(pyobj, h, w)


def polygons_to_mask(polygons: Sequence[Sequence[float]],
                     h: int, w: int) -> np.ndarray:
    """List of polygons (one instance) → (h, w) uint8 mask: the
    frPyObjects + merge + decode chain of PolygonInstance.
    convert_to_binarymask (reference segmentation_mask.py:325-333)."""
    rles = [poly_to_rle(p, h, w) for p in polygons]
    return rle_decode(merge_rles(rles))
