"""SGGLoader: bucketing, iteration resume, threaded prefetch determinism."""

import numpy as np
import pytest

from veto_tpu.data.loader import SGGLoader


class _MiniDataset:
    """In-memory dataset following the shared record protocol, with a
    sequential RNG in get_groundtruth (like the real readers' dup-rel
    sampling) so determinism across worker counts is actually exercised."""

    def __init__(self, n=10, seed=3):
        rng = np.random.RandomState(seed)
        self._images = []
        self.img_info = []
        self.gt = []
        self.rng = np.random.RandomState(0)
        for i in range(n):
            # mix of landscape and portrait
            h, w = (40, 60) if i % 3 else (60, 40)
            self._images.append(rng.rand(h, w, 3).astype(np.float32))
            self.img_info.append({"width": w, "height": h, "image_id": i})
            nb = rng.randint(2, 5)
            boxes = np.sort(rng.uniform(0, 30, (nb, 4)), -1).astype(np.float32)
            boxes[:, 2:] += 5
            self.gt.append({
                "boxes": boxes,
                "labels": rng.randint(1, 7, nb).astype(np.int32),
                "rel_matrix": np.zeros((nb, nb), np.int64),
                "rel_tuples": np.zeros((0, 3), np.int64),
            })
        self.idx_list = list(range(n))

    def __len__(self):
        return len(self.idx_list)

    def get_groundtruth(self, index, inner_idx=True):
        rec = dict(self.gt[index])
        info = self.img_info[index]
        # a sequential RNG draw, like filter_duplicate_rels
        rec["rng_draw"] = float(self.rng.rand())
        rec["size"] = np.array([info["width"], info["height"]], np.int32)
        rec["image_id"] = index
        return rec

    def load_image(self, index):
        return self._images[index]

    def load_depth(self, index):
        return None


def _loader(ds, workers, batch_size=2):
    return SGGLoader(
        ds, batch_size=batch_size, max_boxes=8, num_obj_classes=7,
        min_size=48, max_size=80, use_depth=False, shuffle=True, seed=5,
        size_divisibility=16, num_workers=workers,
    )


def test_workers_bit_identical_to_sequential():
    """The thread pool must not change record order, content, or any RNG
    draw vs num_workers=0."""
    a = [b for b, _ in _loader(_MiniDataset(), 0).iterations(6)]
    b = [b for b, _ in _loader(_MiniDataset(), 4).iterations(6)]
    assert len(a) == len(b) == 6
    import jax

    for x, y in zip(a, b):
        jax.tree.map(
            lambda u, v: np.testing.assert_array_equal(
                np.asarray(u), np.asarray(v)), x, y)


def test_iteration_resume_continues_stream():
    full = [r for _, r in _loader(_MiniDataset(), 2).iterations(8)]
    resumed = [r for _, r in _loader(_MiniDataset(), 2).iterations(8, start_iter=5)]
    assert len(full) == 8 and len(resumed) == 3


def test_epochs_cover_all_images_once_padded():
    ds = _MiniDataset(n=7)
    seen = []
    for batch, recs in _loader(ds, 3).epochs():
        assert batch.images.shape[0] == 2
        seen.extend(r["image_id"] for r in recs)
    # 7 images → 4 padded batches of 2 (one wrapped duplicate)
    assert len(seen) == 8
    assert set(seen) == set(range(7))


def test_aspect_buckets_not_mixed_in_train_batches():
    for batch, recs in _loader(_MiniDataset(n=12), 2).iterations(4):
        aspects = {r["image"].shape[0] > r["image"].shape[1] for r in recs}
        assert len(aspects) == 1


class _RawMiniDataset(_MiniDataset):
    """_MiniDataset + the raw-u8/metadata protocol that enables the fused
    native fast path (load_image_raw/image_size, data/loader.py)."""

    def load_image_raw(self, index):
        return (self._images[index] * 255).astype(np.uint8)

    def load_image(self, index):
        # match VGDataset's contract: the u8 bytes scaled to [0,1], so the
        # slow path sees exactly what the fast path's u8 input encodes
        return self.load_image_raw(index).astype(np.float32) / 255.0

    def load_depth(self, index):
        h, w = self._images[index].shape[:2]
        rng = np.random.RandomState(100 + index)
        return rng.rand(h, w, 1).astype(np.float32)

    def image_size(self, index):
        info = self.img_info[index]
        return info["width"], info["height"]


def test_fused_fast_path_matches_slow_path():
    """The fused C++ path (decode→resize→normalize→pad in one call) must
    reproduce the NumPy pipeline: non-pixel fields exactly, pixels to float
    rounding (the fused kernel skips the /255·x255 cancellation)."""
    from veto_tpu import native

    if not native.available():
        pytest.skip("native host ops unavailable")

    def mk(workers):
        return SGGLoader(
            _RawMiniDataset(), batch_size=2, max_boxes=8, num_obj_classes=7,
            min_size=48, max_size=80, use_depth=True, shuffle=True, seed=5,
            size_divisibility=16, num_workers=workers,
        )

    assert mk(4)._fast_capable() and not mk(0)._fast_capable()
    slow = [b for b, _ in mk(0).iterations(5)]
    fast = [b for b, _ in mk(4).iterations(5)]
    for s, f in zip(slow, fast):
        np.testing.assert_allclose(f.images, s.images, atol=2e-3)
        np.testing.assert_allclose(f.depth, s.depth, atol=1e-4)
        for field in ("boxes", "box_mask", "labels", "rel_matrix", "sizes",
                      "obj_logits"):
            np.testing.assert_array_equal(
                np.asarray(getattr(f, field)), np.asarray(getattr(s, field)),
                err_msg=field,
            )
