"""Host input-pipeline throughput benchmark (VERDICT r4 #3).

Measures the REAL loader path — JPEG decode → C++ bilinear resize →
BGR*255 normalize → depth PNG decode + standardize → bucket pad →
batch assembly → device transfer — at flagship shapes (short side 800 /
long 1333, configs/VETO_final.yaml INPUT), and compares the sustained
host rate against what a v5e-8 needs from ONE host loader:
8 chips x ~29 img/s/chip ≈ 230 img/s.

Real VG images are unavailable offline, so the benchmark synthesizes a
VG-like corpus ON DISK once (JPEGs at the VG size distribution + 16-bit
depth PNGs, cached under /tmp) and drives the production `SGGLoader`
(veto_tpu/data/loader.py) over it — every byte goes through the same
decode/transform/pad code a real run uses.  Reference analog: the torch
DataLoader with NUM_WORKERS processes (pysgg/data/build.py:247).

Prints one JSON line per worker count; the LAST line is the best
sustained rate:
    {"metric": "loader_images_per_sec", "value": ..., "unit": ...}
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS_DIR = "/tmp/veto_bench_corpus_v2"
# the VG raw-size distribution is dominated by ~500x375 COCO-era photos
# with a portrait minority (visual_genome.py image_data widths/heights)
RAW_SIZES = [(500, 375), (640, 480), (500, 333), (375, 500), (800, 600),
             (1024, 768), (333, 500), (612, 612)]


def build_corpus(n_images: int, seed: int = 0) -> str:
    """Write a VG-like JPEG + depth-PNG corpus to disk once."""
    from PIL import Image

    os.makedirs(CORPUS_DIR, exist_ok=True)
    marker = os.path.join(CORPUS_DIR, f"done_{n_images}")
    if os.path.exists(marker):
        return CORPUS_DIR
    rng = np.random.RandomState(seed)
    for i in range(n_images):
        w, h = RAW_SIZES[i % len(RAW_SIZES)]
        # natural-image-like content: low-frequency texture + mild noise
        # (pure noise JPEGs are pathologically slow to decode; flat images
        # unrealistically fast)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        base = (
            127 + 60 * np.sin(xx / (10 + i % 7))[..., None]
            + 50 * np.cos(yy / (13 + i % 5))[..., None]
            + rng.randn(h, w, 1).astype(np.float32) * 12
        )
        img = np.clip(
            base + rng.randn(1, 1, 3).astype(np.float32) * 20, 0, 255
        ).astype(np.uint8)
        img = np.repeat(img, 3, axis=2)[..., :3]
        Image.fromarray(img).save(
            os.path.join(CORPUS_DIR, f"{i}.jpg"), quality=90)
        depth = np.clip(
            30000 + 20000 * np.sin(xx / 40) * np.cos(yy / 30)
            + rng.randn(h, w) * 800, 0, 65535
        ).astype(np.uint16)
        Image.fromarray(depth).save(
            os.path.join(CORPUS_DIR, f"{i}-depth_raw.png"))
    with open(marker, "w") as fh:
        fh.write("ok")
    return CORPUS_DIR


class DiskSGGDataset:
    """VG-shaped dataset over the on-disk corpus (loader-facing subset of
    the VGDataset interface: __len__/load_image/load_depth/
    get_groundtruth)."""

    def __init__(self, root: str, n_images: int, max_boxes: int = 30,
                 num_obj: int = 151, num_rel: int = 51, seed: int = 1):
        self.root = root
        self.n = n_images
        rng = np.random.RandomState(seed)
        self.gt = []
        for i in range(n_images):
            w, h = RAW_SIZES[i % len(RAW_SIZES)]
            nb = rng.randint(6, max_boxes)
            boxes = np.zeros((nb, 4), np.float32)
            boxes[:, 0] = rng.uniform(0, w * 0.7, nb)
            boxes[:, 1] = rng.uniform(0, h * 0.7, nb)
            boxes[:, 2] = boxes[:, 0] + rng.uniform(8, w * 0.3, nb)
            boxes[:, 3] = boxes[:, 1] + rng.uniform(8, h * 0.3, nb)
            labels = rng.randint(1, num_obj, nb).astype(np.int32)
            rel = np.zeros((nb, nb), np.int32)
            for _ in range(rng.randint(3, 12)):
                s, o = rng.randint(0, nb, 2)
                if s != o:
                    rel[s, o] = rng.randint(1, num_rel)
            self.gt.append(dict(boxes=boxes, labels=labels, rel_matrix=rel))

    def __len__(self):
        return self.n

    def load_image(self, index: int) -> np.ndarray:
        from PIL import Image

        img = Image.open(os.path.join(self.root, f"{index}.jpg")).convert("RGB")
        return np.asarray(img, np.float32) / 255.0  # VGDataset contract

    def load_image_raw(self, index: int) -> np.ndarray:
        from PIL import Image

        img = Image.open(os.path.join(self.root, f"{index}.jpg")).convert("RGB")
        return np.asarray(img)

    def image_size(self, index: int):
        w, h = RAW_SIZES[index % len(RAW_SIZES)]
        return w, h

    def load_depth(self, index: int):
        from PIL import Image

        img = Image.open(os.path.join(self.root, f"{index}-depth_raw.png"))
        return np.asarray(img, np.float32)[..., None]

    def get_groundtruth(self, index: int, inner_idx: bool = True):
        return dict(self.gt[index])


def measure(loader, n_batches: int, warmup: int, to_device: bool):
    import jax

    it = loader.iterations(max_iter=n_batches + warmup)
    times = []
    count = 0
    t0 = None
    for i, (batch, recs) in enumerate(it):
        if to_device:
            batch = jax.device_put(batch)
            jax.block_until_ready(batch.images)
        if i + 1 == warmup:
            t0 = time.perf_counter()
        elif i + 1 > warmup:
            count += batch.images.shape[0]
    dt = time.perf_counter() - t0
    return count / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--warmup", type=int, default=4)
    ap.add_argument("--workers", type=int, nargs="+",
                    default=[0, 4, 8, 16, 32])
    ap.add_argument("--no-device", action="store_true",
                    help="skip the device transfer (pure host pipeline)")
    ap.add_argument("--target", type=float, default=230.0,
                    help="img/s one host must sustain for a v5e-8")
    args = ap.parse_args()

    from veto_tpu.data.loader import SGGLoader

    root = build_corpus(args.n_images)
    ds = DiskSGGDataset(root, args.n_images)

    best = (0.0, None)
    for nw in args.workers:
        loader = SGGLoader(
            ds, batch_size=args.batch, max_boxes=80, num_workers=nw,
            use_depth=True, shuffle=True, seed=3,
        )
        rate = measure(loader, args.batches, args.warmup,
                       to_device=not args.no_device)
        print(json.dumps({
            "metric": f"loader_images_per_sec_workers{nw}",
            "value": round(rate, 2), "unit": "images/sec/host",
            "vs_baseline": round(rate / args.target, 3),
        }), flush=True)
        if rate > best[0]:
            best = (rate, nw)

    cores = len(os.sched_getaffinity(0))
    per_image_ms = 1000.0 * cores / best[0] if best[0] else float("inf")
    print(json.dumps({
        "metric": "loader_images_per_sec", "value": round(best[0], 2),
        "unit": "images/sec/host",
        "vs_baseline": round(best[0] / args.target, 3),
        "workers": best[1], "target_8chip": args.target,
        "host_cpu_cores": cores,
        "per_image_cpu_ms": round(per_image_ms, 1),
        # cores one v5e-8 host (112 vCPU) needs at this per-core rate
        "cores_needed_for_target": round(
            args.target * per_image_ms / 1000.0, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
