"""Segmentation containers: polygons + binary masks, numpy-native.

Rebuild of the reference's SegmentationMask / PolygonList /
PolygonInstance / BinaryMaskList (reference
structures/segmentation_mask.py:1-575) with the same operation
semantics — transpose / crop / resize / indexing / conversion — but
host-side numpy instead of torch, and the pure-numpy COCO codec
(utils/coco_mask.py) instead of pycocotools.

These containers are data-pipeline objects: they carry per-instance
segmentations alongside padded box arrays until the mask head projects
them onto fixed (M, M) targets (models/detector/mask_head.py), at which
point everything becomes dense arrays for the TPU.
"""

from __future__ import annotations

import copy
from typing import List, Sequence, Tuple, Union

import numpy as np

from veto_tpu.utils.coco_mask import polygons_to_mask, rle_decode

FLIP_LEFT_RIGHT = 0
FLIP_TOP_BOTTOM = 1

__all__ = [
    "FLIP_LEFT_RIGHT", "FLIP_TOP_BOTTOM", "bilinear_resize",
    "BinaryMaskList", "PolygonInstance", "PolygonList", "SegmentationMask",
]


def bilinear_resize(arr: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """(N, H, W) → (N, h, w) bilinear resample, half-pixel centers.

    Exactly torch's ``interpolate(mode="bilinear", align_corners=False)``
    semantics (the reference resizes masks with it,
    segmentation_mask.py:149-154): source coordinate
    ``(i + 0.5) * H/h - 0.5`` with edge clamping.
    """
    arr = np.asarray(arr, np.float32)
    n, h, w = arr.shape
    oh, ow = out_hw
    ys = (np.arange(oh, dtype=np.float64) + 0.5) * (h / oh) - 0.5
    xs = (np.arange(ow, dtype=np.float64) + 0.5) * (w / ow) - 0.5
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int64)
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0).astype(np.float32)
    wx = np.clip(xs - x0, 0.0, 1.0).astype(np.float32)
    top = arr[:, y0][:, :, x0] * (1 - wx) + arr[:, y0][:, :, x1] * wx
    bot = arr[:, y1][:, :, x0] * (1 - wx) + arr[:, y1][:, :, x1] * wx
    return top * (1 - wy)[None, :, None] + bot * wy[None, :, None]


class BinaryMaskList:
    """All instances of one image as a dense (N, H, W) array
    (reference BinaryMaskList, segmentation_mask.py:33-203)."""

    def __init__(self, masks, size: Tuple[int, int]):
        assert len(size) == 2
        w, h = int(size[0]), int(size[1])
        if isinstance(masks, BinaryMaskList):
            masks = masks.masks.copy()
        elif isinstance(masks, np.ndarray):
            masks = masks.copy()
        elif isinstance(masks, (list, tuple)):
            if len(masks) == 0:
                masks = np.empty((0, h, w), np.float32)
            elif isinstance(masks[0], dict) and "counts" in masks[0]:
                decoded = np.stack([rle_decode(m) for m in masks])
                rh, rw = masks[0]["size"]
                if (rh, rw) != (h, w):
                    decoded = bilinear_resize(decoded, (h, w))
                masks = decoded
            else:
                masks = np.stack([np.asarray(m) for m in masks])
        else:
            raise TypeError(f"cannot interpret masks: {type(masks)}")
        if masks.ndim == 2:
            masks = masks[None]
        assert masks.ndim == 3
        assert masks.shape[1] == h, (masks.shape, size)
        assert masks.shape[2] == w, (masks.shape, size)
        self.masks = masks
        self.size = (w, h)

    def transpose(self, method: int) -> "BinaryMaskList":
        axis = 1 if method == FLIP_TOP_BOTTOM else 2
        return BinaryMaskList(np.flip(self.masks, axis).copy(), self.size)

    def crop(self, box) -> "BinaryMaskList":
        """Integer-rounded crop with the reference's clamping
        (segmentation_mask.py:116-135): round each coordinate, clamp min
        into [0, dim-1] and max into [0, dim], force ≥1 px extent."""
        w, h = self.size
        xmin, ymin, xmax, ymax = [int(round(float(b))) for b in box]
        assert xmin <= xmax and ymin <= ymax, str(box)
        xmin = min(max(xmin, 0), w - 1)
        ymin = min(max(ymin, 0), h - 1)
        xmax = min(max(xmax, 0), w)
        ymax = min(max(ymax, 0), h)
        xmax = max(xmax, xmin + 1)
        ymax = max(ymax, ymin + 1)
        cropped = self.masks[:, ymin:ymax, xmin:xmax]
        return BinaryMaskList(cropped, (xmax - xmin, ymax - ymin))

    def resize(self, size) -> "BinaryMaskList":
        if isinstance(size, (int, float)):
            size = (size, size)
        w, h = map(int, size)
        assert w > 0 and h > 0
        resized = bilinear_resize(self.masks, (h, w)).astype(
            self.masks.dtype)
        return BinaryMaskList(resized, (w, h))

    def convert_to_polygon(self) -> "PolygonList":
        if self.masks.size == 0:
            return PolygonList([], self.size)
        return PolygonList(self._find_contours(), self.size)

    def _find_contours(self) -> List[List[List[float]]]:
        """cv2 external contours per instance, TC89_L1 approximation —
        the reference's _findContours (segmentation_mask.py:168-185)."""
        import cv2

        contours = []
        for mask in self.masks:
            found = cv2.findContours(
                np.ascontiguousarray(mask, np.uint8), cv2.RETR_EXTERNAL,
                cv2.CHAIN_APPROX_TC89_L1,
            )
            # cv2 4.x returns (contours, hierarchy)
            entities = found[0] if len(found) == 2 else found[1]
            reshaped = []
            for ent in entities:
                assert ent.shape[1] == 1, "hierarchical contours not allowed"
                reshaped.append(ent.reshape(-1).astype(float).tolist())
            contours.append(reshaped)
        return contours

    def get_mask_tensor(self) -> np.ndarray:
        return np.squeeze(self.masks, 0) if len(self.masks) == 1 else self.masks

    def __len__(self) -> int:
        return len(self.masks)

    def __getitem__(self, index) -> "BinaryMaskList":
        if self.masks.size == 0:
            raise RuntimeError("Indexing empty BinaryMaskList")
        sel = self.masks[index]
        return BinaryMaskList(sel, self.size)

    def __iter__(self):
        return iter(self.masks)

    def __repr__(self) -> str:
        return (f"{type(self).__name__}(num_instances={len(self.masks)}, "
                f"image_width={self.size[0]}, image_height={self.size[1]})")


class PolygonInstance:
    """One object as a set of polygons
    (reference PolygonInstance, segmentation_mask.py:206-343)."""

    def __init__(self, polygons, size: Tuple[int, int]):
        if isinstance(polygons, PolygonInstance):
            polygons = copy.copy(polygons.polygons)
        else:
            valid = []
            for p in polygons:
                p = np.asarray(p, np.float64).reshape(-1)
                if len(p) >= 6:  # at least 3 points
                    valid.append(p)
            polygons = valid
        self.polygons = polygons
        # sizes stay numeric-as-given: a fractional crop keeps float sizes
        # (reference segmentation_mask.py:246)
        self.size = (size[0], size[1])

    def transpose(self, method: int) -> "PolygonInstance":
        if method not in (FLIP_LEFT_RIGHT, FLIP_TOP_BOTTOM):
            raise NotImplementedError(method)
        dim = self.size[0] if method == FLIP_LEFT_RIGHT else self.size[1]
        idx = 0 if method == FLIP_LEFT_RIGHT else 1
        out = []
        for poly in self.polygons:
            p = poly.copy()
            p[idx::2] = dim - poly[idx::2] - 1  # TO_REMOVE convention
            out.append(p)
        return PolygonInstance(out, self.size)

    def crop(self, box) -> "PolygonInstance":
        """Translate-only crop with the reference's box clamping
        (segmentation_mask.py:271-297 — coordinates are NOT clamped)."""
        w, h = self.size
        xmin, ymin, xmax, ymax = map(float, box)
        assert xmin <= xmax and ymin <= ymax, str(box)
        xmin = min(max(xmin, 0), w - 1)
        ymin = min(max(ymin, 0), h - 1)
        xmax = min(max(xmax, 0), w)
        ymax = min(max(ymax, 0), h)
        xmax = max(xmax, xmin + 1)
        ymax = max(ymax, ymin + 1)
        out = []
        for poly in self.polygons:
            p = poly.copy()
            p[0::2] -= xmin
            p[1::2] -= ymin
            out.append(p)
        return PolygonInstance(out, (xmax - xmin, ymax - ymin))

    def resize(self, size) -> "PolygonInstance":
        if isinstance(size, (int, float)):
            size = (size, size)
        ratio_w = float(size[0]) / float(self.size[0])
        ratio_h = float(size[1]) / float(self.size[1])
        out = []
        for poly in self.polygons:
            p = poly.copy()
            p[0::2] *= ratio_w
            p[1::2] *= ratio_h
            out.append(p)
        return PolygonInstance(out, size)

    def convert_to_binarymask(self) -> np.ndarray:
        w, h = self.size
        return polygons_to_mask([p for p in self.polygons], int(h), int(w))

    def __len__(self) -> int:
        return len(self.polygons)

    def __repr__(self) -> str:
        return (f"{type(self).__name__}(num_groups={len(self.polygons)}, "
                f"image_width={self.size[0]}, image_height={self.size[1]})")


class PolygonList:
    """All object instances of one image as polygons
    (reference PolygonList, segmentation_mask.py:346-473)."""

    def __init__(self, polygons, size: Tuple[int, int]):
        if isinstance(polygons, PolygonList):
            size = polygons.size
            polygons = polygons.polygons
        self.polygons: List[PolygonInstance] = []
        for p in polygons:
            inst = PolygonInstance(p, size)
            if len(inst) > 0:
                self.polygons.append(inst)
        self.size = (size[0], size[1])

    def transpose(self, method: int) -> "PolygonList":
        return PolygonList([p.transpose(method) for p in self.polygons],
                           self.size)

    def crop(self, box) -> "PolygonList":
        w, h = float(box[2]) - float(box[0]), float(box[3]) - float(box[1])
        return PolygonList([p.crop(box) for p in self.polygons], (w, h))

    def resize(self, size) -> "PolygonList":
        return PolygonList([p.resize(size) for p in self.polygons], size)

    def convert_to_binarymask(self) -> BinaryMaskList:
        if len(self) > 0:
            masks = np.stack([p.convert_to_binarymask()
                              for p in self.polygons])
        else:
            w, h = self.size
            masks = np.empty((0, h, w), np.uint8)
        return BinaryMaskList(masks, self.size)

    def __len__(self) -> int:
        return len(self.polygons)

    def __getitem__(self, item) -> "PolygonList":
        if isinstance(item, int):
            selected = [self.polygons[item]]
        elif isinstance(item, slice):
            selected = self.polygons[item]
        else:
            item = np.asarray(item)
            if item.dtype == bool:
                item = np.flatnonzero(item)
            selected = [self.polygons[int(i)] for i in item]
        return PolygonList(selected, self.size)

    def __iter__(self):
        return iter(self.polygons)

    def __repr__(self) -> str:
        return (f"{type(self).__name__}(num_instances={len(self.polygons)}, "
                f"image_width={self.size[0]}, image_height={self.size[1]})")


class SegmentationMask:
    """Mode-transparent wrapper over PolygonList / BinaryMaskList
    (reference SegmentationMask, segmentation_mask.py:476-575)."""

    def __init__(self, instances, size: Tuple[int, int], mode: str = "poly"):
        assert len(size) == 2
        if mode == "poly":
            self.instances: Union[PolygonList, BinaryMaskList] = PolygonList(
                instances, size)
        elif mode == "mask":
            self.instances = BinaryMaskList(instances, size)
        else:
            raise NotImplementedError(f"Unknown mode: {mode}")
        self.mode = mode
        self.size = (size[0], size[1])

    def transpose(self, method: int) -> "SegmentationMask":
        return SegmentationMask(self.instances.transpose(method), self.size,
                                self.mode)

    def crop(self, box) -> "SegmentationMask":
        cropped = self.instances.crop(box)
        return SegmentationMask(cropped, cropped.size, self.mode)

    def resize(self, size, *args, **kwargs) -> "SegmentationMask":
        return SegmentationMask(self.instances.resize(size), size, self.mode)

    def convert(self, mode: str) -> "SegmentationMask":
        if mode == self.mode:
            return self
        if mode == "poly":
            converted = self.instances.convert_to_polygon()
        elif mode == "mask":
            converted = self.instances.convert_to_binarymask()
        else:
            raise NotImplementedError(f"Unknown mode: {mode}")
        return SegmentationMask(converted, self.size, mode)

    def get_mask_tensor(self) -> np.ndarray:
        instances = self.instances
        if self.mode == "poly":
            instances = instances.convert_to_binarymask()
        return instances.get_mask_tensor()

    def __len__(self) -> int:
        return len(self.instances)

    def __getitem__(self, item) -> "SegmentationMask":
        return SegmentationMask(self.instances[item], self.size, self.mode)

    def __iter__(self):
        self._iter_idx = 0
        return self

    def __next__(self) -> "SegmentationMask":
        if self._iter_idx < len(self):
            out = self[self._iter_idx]
            self._iter_idx += 1
            return out
        raise StopIteration

    def __repr__(self) -> str:
        return (f"{type(self).__name__}(num_instances={len(self.instances)}, "
                f"image_width={self.size[0]}, image_height={self.size[1]}, "
                f"mode={self.mode})")
