"""Data loading: bucketed batches, iteration-based sampling, host sharding.

Replaces the reference's sampler stack (pysgg/data/samplers/: rank-strided
DistributedSampler, aspect-ratio GroupedBatchSampler, infinite
IterationBasedBatchSampler) and make_data_loader (build.py:247-432) with a
simple deterministic pipeline:

  * per-host shard: this process sees indices [host_id::num_hosts]
    (jax idiom replacing the rank-strided torch sampler).
  * epoch shuffling seeded by (seed, epoch) — reproducible like the
    reference's set_epoch protocol.
  * aspect-ratio grouping: images are routed to (portrait, landscape)
    buckets (grouped_batch_sampler.py groups on aspect < 1) so a batch
    shares one padded shape — compile-once on TPU.
  * iteration-based: yields exactly max_iter batches starting at start_iter
    (checkpoint resume).

Transforms (resize → normalize → pad) run here on host NumPy.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from veto_tpu.engine.batch import SGGBatch

from .batching import make_sgg_batch
from .transforms import (
    bucket_shape,
    normalize_depth,
    normalize_image,
    pad_to,
    resize_image,
    resize_shape,
)


def prepare_record(
    dataset,
    index: int,
    min_size: int,
    max_size: int,
    pixel_mean,
    pixel_std,
    to_bgr255: bool = True,
    use_depth: bool = True,
) -> Dict:
    """Load + transform one image into a batch-ready record."""
    rec = dataset.get_groundtruth(index, inner_idx=False)
    inner = dataset.idx_list[index] if hasattr(dataset, "idx_list") else index
    image = dataset.load_image(inner)
    h0, w0 = image.shape[:2]
    oh, ow = resize_shape(w0, h0, min_size, max_size)
    image = resize_image(image, oh, ow)
    image = normalize_image(image, pixel_mean, pixel_std, to_bgr255)

    depth = None
    if use_depth:
        raw = dataset.load_depth(inner)
        if raw is not None:
            depth = normalize_depth(resize_image(raw, oh, ow))
        else:
            depth = np.zeros((oh, ow, 1), np.float32)

    # boxes scale with the resize (BoxList.resize in reference Resize)
    sy, sx = oh / h0, ow / w0
    boxes = rec["boxes"] * np.array([sx, sy, sx, sy], np.float32)
    out = dict(rec)
    out.update(image=image, depth=depth, boxes=boxes,
               size=np.array([ow, oh], np.int32))
    return out


class SGGLoader:
    """Deterministic bucketed loader over a VG/GQA-style dataset."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        max_boxes: int = 80,
        num_obj_classes: int = 151,
        min_size: int = 800,
        max_size: int = 1333,
        pixel_mean=(102.9801, 115.9465, 122.7717),
        pixel_std=(1.0, 1.0, 1.0),
        use_depth: bool = True,
        shuffle: bool = True,
        seed: int = 1,
        host_id: int = 0,
        num_hosts: int = 1,
        size_divisibility: int = 32,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_boxes = max_boxes
        self.num_obj_classes = num_obj_classes
        self.min_size = min_size
        self.max_size = max_size
        self.pixel_mean = pixel_mean
        self.pixel_std = pixel_std
        self.use_depth = use_depth
        self.shuffle = shuffle
        self.seed = seed
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.div = size_divisibility
        # two aspect groups like the reference GroupedBatchSampler
        self.pad_shapes = {
            "landscape": bucket_shape(min_size, max_size, size_divisibility),
            "portrait": bucket_shape(max_size, min_size, size_divisibility),
        }

    def _indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState((self.seed, epoch).__hash__() % (2**31))
            rng.shuffle(idx)
        return idx[self.host_id :: self.num_hosts]

    def _record(self, index: int) -> Dict:
        return prepare_record(
            self.dataset, index, self.min_size, self.max_size,
            self.pixel_mean, self.pixel_std, use_depth=self.use_depth,
        )

    def _assemble(self, records) -> SGGBatch:
        portrait = records[0]["image"].shape[0] > records[0]["image"].shape[1]
        shape = self.pad_shapes["portrait" if portrait else "landscape"]
        for r in records:
            r["image"] = pad_to(r["image"], *shape)
            if r["depth"] is not None:
                r["depth"] = pad_to(r["depth"], *shape)
        return make_sgg_batch(records, shape, self.max_boxes, self.num_obj_classes)

    def epochs(self) -> Iterator[Tuple[SGGBatch, list]]:
        """One pass over this host's shard (eval)."""
        idx = self._indices(epoch=0)
        for start in range(0, len(idx), self.batch_size):
            chunk = idx[start : start + self.batch_size]
            if len(chunk) < self.batch_size:  # pad final batch by wrapping
                chunk = np.concatenate([chunk, idx[: self.batch_size - len(chunk)]])
            recs = [self._record(int(i)) for i in chunk]
            groups = {}
            for r in recs:
                groups.setdefault(r["image"].shape[0] > r["image"].shape[1], []).append(r)
            # keep one aspect group per batch; spill the minority into
            # the same batch anyway (padding dominates only when mixed —
            # eval batches are small so this is acceptable)
            yield self._assemble(recs), recs

    def iterations(
        self, max_iter: int, start_iter: int = 0
    ) -> Iterator[Tuple[SGGBatch, list]]:
        """Infinite iteration-based training stream with resume
        (IterationBasedBatchSampler semantics)."""
        it = start_iter
        epoch = 0
        buffers: Dict[bool, list] = {True: [], False: []}
        while it < max_iter:
            for index in self._indices(epoch):
                rec = self._record(int(index))
                key = rec["image"].shape[0] > rec["image"].shape[1]
                buffers[key].append(rec)
                if len(buffers[key]) == self.batch_size:
                    yield self._assemble(buffers[key]), buffers[key]
                    buffers[key] = []
                    it += 1
                    if it >= max_iter:
                        return
            epoch += 1
