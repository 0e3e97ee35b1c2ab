"""Deterministic synthetic SGG dataset.

The reference test-suite builds random images + BoxLists inline
(tests/test_detectors.py, test_feature_extractors.py:15-30); we go further
and provide a seeded dataset object with a VG-compatible schema (boxes,
labels, dense relation matrix, relation tuples, depth channel) so the full
train/eval path — including metrics — runs hermetically without
VG-SGG-with-attri.h5.  Also used by bench.py for throughput measurement.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


class SyntheticSGGDataset:
    def __init__(
        self,
        num_images: int = 16,
        image_size: tuple = (256, 256),
        num_obj_classes: int = 151,
        num_rel_classes: int = 51,
        max_objects: int = 20,
        min_objects: int = 4,
        max_relations: int = 12,
        seed: int = 0,
        with_depth: bool = True,
        render_boxes: bool = False,
        deterministic_rels: bool = False,
        with_masks: bool = False,
        with_keypoints: int = 0,
    ):
        self.num_images = num_images
        self.image_size = image_size
        self.num_obj_classes = num_obj_classes
        self.num_rel_classes = num_rel_classes
        self.max_objects = max_objects
        self.min_objects = min_objects
        self.max_relations = max_relations
        self.seed = seed
        self.with_depth = with_depth
        # render_boxes=True paints each object as a class-colored rectangle
        # (deterministic color per class) over a dim noise background, so a
        # DETECTOR can actually learn localization + classification from the
        # pixels — used by the sgdet overfit test.  The default (False) keeps
        # pure-noise images: cheapest to generate, sufficient for predcls
        # (GT boxes are inputs) and for throughput benches.
        self.render_boxes = render_boxes
        # deterministic_rels=True makes the predicate a fixed function of the
        # (subject, object) class pair instead of a random draw, so a model
        # that recognises the two classes CAN predict the relation from
        # pixels alone — required for the sgdet overfit test, where the
        # relation head only sees detector features (no GT identity to
        # memorise against).
        self.deterministic_rels = deterministic_rels
        # with_masks=True emits per-instance dense GT masks: an ellipse
        # inscribed in each box (so the mask differs from the trivial box
        # fill — a mask head that merely predicts the box fails on it)
        self.with_masks = with_masks
        # with_keypoints=K emits K [x, y, vis] keypoints per instance at
        # deterministic fractional positions inside the box
        self.with_keypoints = with_keypoints

    def __len__(self) -> int:
        return self.num_images

    def __getitem__(self, idx: int) -> Dict:
        rng = np.random.RandomState(self.seed * 100003 + idx)
        h, w = self.image_size
        n = rng.randint(self.min_objects, self.max_objects + 1)

        x1 = rng.uniform(0, w * 0.7, n)
        y1 = rng.uniform(0, h * 0.7, n)
        bw = rng.uniform(w * 0.1, w * 0.3, n)
        bh = rng.uniform(h * 0.1, h * 0.3, n)
        boxes = np.stack(
            [x1, y1, np.minimum(x1 + bw, w - 1), np.minimum(y1 + bh, h - 1)], axis=1
        ).astype(np.float32)
        labels = rng.randint(1, self.num_obj_classes, n).astype(np.int32)

        rel_matrix = np.zeros((n, n), np.int32)
        num_rel = rng.randint(1, self.max_relations + 1)
        for _ in range(num_rel):
            s, o = rng.randint(0, n, 2)
            if s != o and rel_matrix[s, o] == 0:
                if self.deterministic_rels:
                    rel_matrix[s, o] = 1 + (
                        int(labels[s]) * 3 + int(labels[o]) * 5
                    ) % (self.num_rel_classes - 1)
                else:
                    rel_matrix[s, o] = rng.randint(1, self.num_rel_classes)

        rel_tuples = np.column_stack(np.nonzero(rel_matrix))
        rel_tuples = np.column_stack(
            [rel_tuples, rel_matrix[rel_tuples[:, 0], rel_tuples[:, 1]]]
        ).astype(np.int64) if len(rel_tuples) else np.zeros((0, 3), np.int64)

        if self.render_boxes:
            image = rng.uniform(-0.1, 0.1, (h, w, 3)).astype(np.float32)
            # later (higher-index) objects paint over earlier ones, so every
            # box keeps at least its top/left edge visible
            for j in range(n):
                crng = np.random.RandomState(10007 * int(labels[j]) + 7)
                color = crng.uniform(-1, 1, 3).astype(np.float32)
                xa, ya, xb, yb = boxes[j].astype(int)
                image[ya:yb + 1, xa:xb + 1] = color
                # bright border marks the extent (helps box regression)
                image[ya, xa:xb + 1] = 1.0
                image[yb, xa:xb + 1] = 1.0
                image[ya:yb + 1, xa] = 1.0
                image[ya:yb + 1, xb] = 1.0
        else:
            image = rng.uniform(-1, 1, (h, w, 3)).astype(np.float32)
        depth = (
            rng.uniform(-1, 1, (h, w, 1)).astype(np.float32)
            if self.with_depth
            else None
        )
        rec = {
            "image": image,
            "depth": depth,
            "boxes": boxes,
            "labels": labels,
            "rel_matrix": rel_matrix,
            "rel_tuples": rel_tuples,
            "size": np.array([w, h], np.int32),
        }
        if self.with_masks:
            masks = np.zeros((n, h, w), np.float32)
            yy, xx = np.mgrid[0:h, 0:w]
            for j in range(n):
                xa, ya, xb, yb = boxes[j]
                cx, cy = (xa + xb) / 2, (ya + yb) / 2
                rx = max((xb - xa) / 2, 1.0)
                ry = max((yb - ya) / 2, 1.0)
                masks[j] = (((xx - cx) / rx) ** 2
                            + ((yy - cy) / ry) ** 2 <= 1.0)
            rec["masks"] = masks
        if self.with_keypoints:
            k = self.with_keypoints
            fr = (np.arange(k, dtype=np.float32) + 0.5) / k
            kps = np.zeros((n, k, 3), np.float32)
            for j in range(n):
                xa, ya, xb, yb = boxes[j]
                kps[j, :, 0] = xa + fr * (xb - xa)
                kps[j, :, 1] = ya + fr[::-1] * (yb - ya)
                kps[j, :, 2] = 2.0
            rec["keypoints"] = kps
        return rec

    def batches(self, batch_size: int, max_boxes: int):
        """Yield (SGGBatch, list[record]) batches covering the dataset."""
        from .batching import make_sgg_batch

        for start in range(0, len(self), batch_size):
            recs = [self[i % len(self)] for i in range(start, start + batch_size)]
            yield make_sgg_batch(
                recs, self.image_size, max_boxes, self.num_obj_classes
            ), recs
