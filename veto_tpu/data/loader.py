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


def load_pixels(
    dataset,
    inner: int,
    min_size: int,
    max_size: int,
    pixel_mean,
    pixel_std,
    to_bgr255: bool = True,
    use_depth: bool = True,
):
    """Decode + resize + normalize one image (thread-safe: no shared RNG).

    Split from :func:`prepare_record` so the loader's worker pool can run
    the pixel work in parallel while ground-truth sampling (which draws
    from the dataset's sequential RNG) stays on the main thread in index
    order — preserving bit-exact determinism."""
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
    return image, depth, (h0, w0), (oh, ow)


def finish_record(rec: Dict, pixels) -> Dict:
    image, depth, (h0, w0), (oh, ow) = pixels
    # boxes scale with the resize (BoxList.resize in reference Resize)
    sy, sx = oh / h0, ow / w0
    boxes = rec["boxes"] * np.array([sx, sy, sx, sy], np.float32)
    out = dict(rec)
    out.update(image=image, depth=depth, boxes=boxes,
               size=np.array([ow, oh], np.int32))
    return out


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
    return finish_record(
        rec,
        load_pixels(dataset, inner, min_size, max_size, pixel_mean,
                    pixel_std, to_bgr255, use_depth),
    )


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
        num_workers: int = 4,
        prefetch: int = 2,
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
        self.num_workers = num_workers
        self.prefetch = prefetch
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

    def _stream_records(self, idx_iter) -> Iterator[Dict]:
        """Records in index order with the pixel work on a thread pool.

        The reference overlaps host work via torch DataLoader workers
        (NUM_WORKERS processes); here a bounded thread pool does the
        decode/resize (PIL and the native resize release the GIL) while
        ground-truth assembly stays sequential on this thread, so record
        order and every RNG draw are identical to num_workers=0."""
        if self.num_workers <= 0:
            for i in idx_iter:
                yield self._record(int(i))
            return
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        ds = self.dataset
        depth = self.num_workers + self.batch_size * self.prefetch

        def pixels(inner):
            return load_pixels(
                ds, inner, self.min_size, self.max_size, self.pixel_mean,
                self.pixel_std, use_depth=self.use_depth,
            )

        with ThreadPoolExecutor(self.num_workers) as ex:
            pending = deque()

            def submit(i):
                i = int(i)
                rec = ds.get_groundtruth(i, inner_idx=False)
                inner = ds.idx_list[i] if hasattr(ds, "idx_list") else i
                pending.append((rec, ex.submit(pixels, inner)))

            for i in idx_iter:
                submit(i)
                if len(pending) >= depth:
                    rec, fut = pending.popleft()
                    yield finish_record(rec, fut.result())
            while pending:
                rec, fut = pending.popleft()
                yield finish_record(rec, fut.result())

    # ------------------------------------------------------------------
    # fused-native fast path: workers decode + resize/normalize/pad
    # straight into preallocated batch arrays (one C++ call per image —
    # no [0,1] conversion, no normalize pass, no pad copy, no batch copy)
    # ------------------------------------------------------------------
    def _fast_capable(self) -> bool:
        from veto_tpu import native

        return (
            self.num_workers > 0
            and native.available()
            and hasattr(self.dataset, "load_image_raw")
            and hasattr(self.dataset, "image_size")
        )

    def _fast_batches(self, idx_iter) -> Iterator[Tuple[SGGBatch, list]]:
        """Batch stream over the fused path.

        Aspect routing uses the dataset's size metadata (img_info, like
        the reference GroupedBatchSampler) so no decode happens on the
        main thread; GT assembly (sequential RNG) stays here in index
        order, preserving determinism across worker counts.  Pixel
        numerics match the NumPy path to float rounding (the fused kernel
        skips the exact /255·x255 cancellation the slow path computes).
        """
        from concurrent.futures import ThreadPoolExecutor

        from veto_tpu import native

        ds = self.dataset
        mean, std = self.pixel_mean, self.pixel_std
        use_depth = self.use_depth
        bsz = self.batch_size

        def task(inner, oh, ow, img_slot, depth_slot):
            raw = ds.load_image_raw(inner)
            native.resize_normalize_u8_into(raw, oh, ow, img_slot, mean, std)
            if use_depth:
                d = ds.load_depth(inner)
                if d is None:
                    depth_slot[:] = 0.0
                else:
                    native.resize_standardize_into(d, oh, ow, depth_slot)
            else:
                depth_slot[:] = 0.0

        open_bufs: Dict[bool, dict] = {}
        with ThreadPoolExecutor(self.num_workers) as ex:
            for i in idx_iter:
                i = int(i)
                inner = ds.idx_list[i] if hasattr(ds, "idx_list") else i
                w0, h0 = ds.image_size(inner)
                oh, ow = resize_shape(w0, h0, self.min_size, self.max_size)
                key = oh > ow
                buf = open_bufs.get(key)
                if buf is None:
                    ph, pw = self.pad_shapes["portrait" if key else "landscape"]
                    buf = open_bufs[key] = dict(
                        images=np.empty((bsz, ph, pw, 3), np.float32),
                        depth=np.empty((bsz, ph, pw, 1), np.float32),
                        recs=[], futs=[],
                    )
                slot = len(buf["recs"])
                rec = dict(ds.get_groundtruth(i, inner_idx=False))
                sy, sx = oh / h0, ow / w0
                rec["boxes"] = rec["boxes"] * np.array(
                    [sx, sy, sx, sy], np.float32)
                rec["size"] = np.array([ow, oh], np.int32)
                buf["recs"].append(rec)
                buf["futs"].append(ex.submit(
                    task, inner, oh, ow,
                    buf["images"][slot], buf["depth"][slot],
                ))
                if len(buf["recs"]) == bsz:
                    del open_bufs[key]
                    for f in buf["futs"]:
                        f.result()
                    yield make_sgg_batch(
                        buf["recs"], buf["images"].shape[1:3],
                        self.max_boxes, self.num_obj_classes,
                        pixel_arrays=(buf["images"], buf["depth"]),
                    ), buf["recs"]

    def _assemble(self, records) -> SGGBatch:
        aspects = {r["image"].shape[0] > r["image"].shape[1] for r in records}
        if len(aspects) == 1:
            shape = self.pad_shapes["portrait" if aspects.pop() else "landscape"]
        else:
            # mixed aspect (eval wrap-padding can mix groups): pad to the
            # envelope of both buckets so nothing overflows
            a, b = self.pad_shapes["portrait"], self.pad_shapes["landscape"]
            shape = (max(a[0], b[0]), max(a[1], b[1]))
        for r in records:
            r["image"] = pad_to(r["image"], *shape)
            if r["depth"] is not None:
                r["depth"] = pad_to(r["depth"], *shape)
        return make_sgg_batch(records, shape, self.max_boxes, self.num_obj_classes)

    def epochs(self) -> Iterator[Tuple[SGGBatch, list]]:
        """One pass over this host's shard (eval)."""
        idx = self._indices(epoch=0)
        chunks = []
        for start in range(0, len(idx), self.batch_size):
            chunk = idx[start : start + self.batch_size]
            if len(chunk) < self.batch_size:  # pad final batch by wrapping
                chunk = np.concatenate([chunk, idx[: self.batch_size - len(chunk)]])
            chunks.append(chunk)
        stream = self._stream_records(
            (int(i) for chunk in chunks for i in chunk))
        for chunk in chunks:
            recs = [next(stream) for _ in chunk]
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

        def index_stream():
            e = epoch
            while True:
                for index in self._indices(e):
                    yield int(index)
                e += 1

        if self._fast_capable():
            for batch, recs in self._fast_batches(index_stream()):
                yield batch, recs
                it += 1
                if it >= max_iter:
                    return
            return

        stream = self._stream_records(index_stream())
        while it < max_iter:
            for rec in stream:
                key = rec["image"].shape[0] > rec["image"].shape[1]
                buffers[key].append(rec)
                if len(buffers[key]) == self.batch_size:
                    yield self._assemble(buffers[key]), buffers[key]
                    buffers[key] = []
                    it += 1
                    if it >= max_iter:
                        return
