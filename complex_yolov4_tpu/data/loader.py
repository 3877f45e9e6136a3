"""Batch iteration: deterministic sharded sampling, multiscale, prefetch.

Replaces the reference's DataLoader + DistributedSampler stack
(reference: src/data_process/kitti_dataloader.py:22-76) with:

- a seeded per-epoch permutation, sliced per host (`shard_id`/`num_shards`)
  so every host reads a disjoint static subset — the SPMD input-sharding
  pattern that stands in for DistributedSampler + set_epoch;
- fixed-shape numpy batches (image NHWC, targets (B, T, 7), mask (B, T));
- the reference's multiscale schedule: a new size from
  {S-96 .. S+96 step 32} every 10 batches, seeded per epoch
  (reference: kitti_dataset.py:216-235), applied as a host-side resize;
- a background-thread prefetcher so raster/augment work overlaps device
  compute (double buffering; the reference used worker processes).
"""

from __future__ import annotations

import os
import queue
import threading
import warnings
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import cv2
import numpy as np

from ..config import kitti as cnf
from .dataset import KittiDataset
from .transforms import default_aug_transforms, default_lidar_transforms

_MULTISCALE_EVERY = 10  # batches between size redraws (reference parity)

# Static point padding for the device-raster training path (matches the
# serving pipeline's right-sized pad, PERF.md): boundary-cropped KITTI /
# synthetic clouds stay under this.
MAX_POINTS = 20480
# Per-frame occupied-cell budget for the COO val path: a cell needs at least
# one point, so cells <= points; synthetic scenes average ~12.6k cells/frame.
MAX_CELLS = 16384

# One process-wide assembly pool shared by every BatchIterator (avoids
# leaking idle threads when loaders are created per epoch/test).
_SHARED_POOL: Optional[ThreadPoolExecutor] = None


def _shared_pool() -> ThreadPoolExecutor:
    global _SHARED_POOL
    if _SHARED_POOL is None:
        _SHARED_POOL = ThreadPoolExecutor(
            max_workers=min(8, os.cpu_count() or 4),
            thread_name_prefix="cyv4-loader")
    return _SHARED_POOL



class BatchIterator:
    """Deterministic epoch iterator over fixed-shape BEV batches."""

    def __init__(
        self,
        dataset: KittiDataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        multiscale: bool = False,
        seed: int = 2020,
        shard_id: int = 0,
        num_shards: int = 1,
        prefetch: int = 2,
        workers: int = 0,
        device_raster: bool = False,
        max_holes: int = 1,
        cells_raster: bool = False,
        cells_batched: bool = False,
        cell_capacity: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.multiscale = multiscale and not dataset.mosaic
        # Device-raster mode (training): emit compact padded POINTS plus the
        # image-space augmentation decisions instead of rasterized images —
        # the jitted train step rasterizes on device (~14x less H2D; critical
        # through low-bandwidth links, and frees the host for augmentation).
        # Mosaic keeps the host/native raster path (its canvas resize is an
        # image-space op).
        self.device_raster = device_raster and not dataset.mosaic
        # COO-raster mode (augmentation-free val/test serving): the host
        # aggregates each cloud to per-cell (id, packed key, density) while
        # it already parses it, and the device does two conflict-free
        # scatter-sets — parity-STRICTER and faster than the raw-point
        # scatter (PERF.md r3 batch-3), but incompatible with on-device
        # flip/cutout (training) and with batch-axis sharding (flat buffer),
        # so it is opt-in for single-device inference loaders.
        self.cells_raster = (cells_raster and self.device_raster
                             and not dataset.aug_transforms)
        # Batched (B, C) COO layout instead of the flat one: per-frame-local
        # cell ids with a batch axis, so the from_cells program can shard
        # over a data mesh (bev.pack_cells_batched). Lanes cost B x per-frame
        # capacity instead of the batch total — single-device serving keeps
        # the flat layout (the measured-fastest config, PERF.md r3).
        self.cells_batched = cells_batched
        # Static COO cell capacity (per frame). None = derive from the
        # workload at first use: scatter cost scales with lane CAPACITY, not
        # live lanes (PERF.md), and the old batch*16384 worst case paid ~15%
        # more raster lanes than the benched right-sized config.
        self.cell_capacity = cell_capacity
        self.max_holes = max_holes
        self.seed = seed
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.prefetch = prefetch
        self.workers = workers if workers > 0 else min(8, os.cpu_count() or 4)
        self.epoch = 0
        self._warned_truncate = False
        self._warned_cell_truncate = False
        self._dropped_cells = 0
        self._warned_holes = False
        base = dataset.img_size
        self.size_choices = list(range(base - 3 * 32, base + 3 * 32 + 1, 32))

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        rng = np.random.default_rng((self.seed, self.epoch))
        idx = rng.permutation(n) if self.shuffle else np.arange(n)
        if self.num_shards > 1:
            # Pad to a multiple of num_shards by wrapping (every shard sees
            # the same number of samples; DistributedSampler semantics).
            per = -(-n // self.num_shards)
            padded = np.concatenate([idx, idx[: per * self.num_shards - n]])
            idx = padded[self.shard_id::self.num_shards]
        return idx

    def __len__(self) -> int:
        n = len(self._epoch_indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _load_one(self, index: int, j: int, size: int):
        rng = np.random.default_rng((self.seed, self.epoch, int(index), j))
        _, img, targets, mask = self.dataset.get_item(int(index), rng)
        if img.shape[0] != size:
            img = cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
        return img, targets, mask

    def _load_one_deferred(self, index: int, j: int):
        """Device-raster sample: (points, pmask, flip, holes, hole_mask,
        targets, mask). The SAME rng stream as `_load_one` (the transforms run
        normally; only pixel movement is deferred to the device)."""
        from . import bev as bev_mod

        rng = np.random.default_rng((self.seed, self.epoch, int(index), j))
        _, (probe, lidar), targets, mask = self.dataset.load_sample(
            int(index), rng, defer_raster=True)
        cropped = bev_mod.remove_points_outside(lidar)
        if cropped.shape[0] > MAX_POINTS and not self._warned_truncate:
            self._warned_truncate = True
            warnings.warn(
                f"device-raster path truncating {cropped.shape[0] - MAX_POINTS}"
                f" of {cropped.shape[0]} in-boundary points (cap {MAX_POINTS});"
                " dense frames will differ from the host raster",
                stacklevel=2)
        pts, pmask = bev_mod.pad_points(cropped, MAX_POINTS)
        if len(probe.holes) > self.max_holes and not self._warned_holes:
            self._warned_holes = True
            warnings.warn(
                f"device-raster path dropping {len(probe.holes) - self.max_holes}"
                f" cutout hole(s) beyond max_holes={self.max_holes}; pass"
                " max_holes >= cutout n_holes to BatchIterator", stacklevel=2)
        holes = np.zeros((self.max_holes, 5), np.float32)
        hole_mask = np.zeros((self.max_holes,), np.float32)
        for h, (y1, y2, x1, x2, fill) in enumerate(probe.holes[: self.max_holes]):
            holes[h] = (y1, y2, x1, x2, fill)
            hole_mask[h] = 1.0
        return (pts, pmask, np.float32(probe.flipped), holes, hole_mask,
                targets, mask)

    def _make_batch_deferred(self, indices: np.ndarray, size: int) -> Dict[str, np.ndarray]:
        from .dataset import _ProbeUnsupported

        try:
            if self.workers > 1 and len(indices) > 1:
                results = list(_shared_pool().map(
                    lambda ji: self._load_one_deferred(int(ji[1]), ji[0]),
                    enumerate(indices)))
            else:
                results = [self._load_one_deferred(int(index), j)
                           for j, index in enumerate(indices)]
        except (_ProbeUnsupported, TypeError, AttributeError,
                NotImplementedError):
            # A custom image-space transform the probe can't record —
            # _AugProbe only implements the built-in flip/cutout access
            # patterns, so arbitrary array ops raise plain TypeError/
            # AttributeError (same catch set as dataset.load_mosaic);
            # fall back to the host-raster path.
            return None
        cols = list(zip(*results))
        batch = {
            "points": np.stack(cols[0]),
            "point_mask": np.stack(cols[1]),
            "flip": np.asarray(cols[2], np.float32),
            "holes": np.stack(cols[3]),
            "hole_mask": np.stack(cols[4]),
            "targets": np.stack(cols[5]).astype(np.float32),
            "target_mask": np.stack(cols[6]).astype(np.float32),
            "sample_ids": np.asarray(
                [self.dataset.sample_id_list[int(i)] for i in indices], np.int64),
            "size": int(size),
        }
        return batch

    def _cells_per_frame_cap(self) -> int:
        """Per-frame COO cell capacity, derived from the workload once: the
        max occupied-cell count over a small evenly-spaced frame sample,
        +12.5% headroom (the bench's measured capacity policy, PERF.md r3
        batch-4), clamped to MAX_CELLS. Frames beyond the estimate surface
        through the dropped-cell warning/count rather than silently."""
        if self.cell_capacity is not None:
            return self.cell_capacity
        from . import bev as bev_mod

        n = len(self.dataset)
        sample = np.unique(np.linspace(0, n - 1, min(16, n)).astype(int))
        worst = 1024
        for i in sample:
            lidar = self.dataset.get_lidar(self.dataset.sample_id_list[int(i)])
            c, _ = bev_mod.aggregate_bev_cells(
                bev_mod.remove_points_outside(lidar))
            worst = max(worst, len(c))
        self.cell_capacity = min(worst + worst // 8, MAX_CELLS)
        return self.cell_capacity

    def _make_batch_deferred_cells(self, indices: np.ndarray
                                   ) -> Dict[str, np.ndarray]:
        """COO val batch: per-cell (id, key, density) aggregated on host,
        packed at a fixed capacity (stable jit signature), plus the
        fixed-shape targets. Targets/labels follow the same rng-free val
        path as `_load_one_deferred` (no augmentation by construction).

        Flat layout (default): one (batch_cap * per-frame-cap,) buffer packed
        to the batch TOTAL — fewest lanes, single-device. Batched layout
        (`cells_batched`): (batch_cap, per-frame-cap) with frame-local ids —
        shards over a data mesh. Both pack at the loader's FULL batch size so
        a remainder tail batch reuses the full-batch compiled program (the
        pad frames raster empty and the caller slices them off)."""
        from . import bev as bev_mod

        from .. import native

        use_native = native.is_available()

        def load_one(j_index):
            j, index = j_index
            rng = np.random.default_rng((self.seed, self.epoch, int(index), j))
            _, (_, lidar), targets, mask = self.dataset.load_sample(
                int(index), rng, defer_raster=True)
            # C++ single-pass aggregation when available (bit-identical to
            # the numpy path, tests/test_native.py). Measured supply on this
            # 1-core host: numpy 142 f/s (below the ~510 f/s device rate —
            # it WAS the binding constraint), native 420 f/s (PERF.md r4).
            if use_native:
                c, k = native.aggregate_cells(lidar)
            else:
                c, k = bev_mod.aggregate_bev_cells(
                    bev_mod.remove_points_outside(lidar))
            return c, k, targets, mask

        if self.workers > 1 and len(indices) > 1:
            # IO + the GIL-releasing C++ aggregation overlap across threads
            # (same pool as the points path).
            results = list(_shared_pool().map(load_one, enumerate(indices)))
        else:
            results = [load_one(ji) for ji in enumerate(indices)]
        cells_l = [r[0] for r in results]
        keys_l = [r[1] for r in results]
        tgts = [r[2] for r in results]
        masks = [r[3] for r in results]
        ids = [self.dataset.sample_id_list[int(i)] for i in indices]
        per_frame = self._cells_per_frame_cap()
        if self.cells_batched:
            dropped = sum(max(0, len(c) - per_frame) for c in cells_l)
            cells, keys, dens = bev_mod.pack_cells_batched(
                cells_l, keys_l, per_frame, total_frames=self.batch_size)
        else:
            cap = self.batch_size * per_frame
            total = sum(len(c) for c in cells_l)
            dropped = max(0, total - cap)
            cells, keys, dens = bev_mod.pack_cells_flat(
                cells_l, keys_l, cap, total_frames=self.batch_size)
        if dropped:
            self._dropped_cells += dropped
            if not self._warned_cell_truncate:
                self._warned_cell_truncate = True
                warnings.warn(
                    f"cells-raster path dropping {dropped} occupied cells "
                    f"this batch (per-frame capacity {per_frame}); total "
                    "dropped is reported at iterator exhaustion — pass "
                    "cell_capacity to raise the cap", stacklevel=2)
        return {
            "cells": cells, "cell_keys": keys, "cell_dens": dens,
            "batch": len(indices), "batch_cap": self.batch_size,
            "targets": np.stack(tgts).astype(np.float32),
            "target_mask": np.stack(masks).astype(np.float32),
            "sample_ids": np.asarray(ids, np.int64),
        }

    def _make_batch_deferred_test(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        """Test-mode deferred batch: compact padded points for the
        `from_points` inference program, PLUS the host-rasterized BEV image
        (native, ~3 ms/frame) for drawing — only the points cross the link."""
        from . import bev as bev_mod
        from .. import native

        b = len(indices)
        pts = np.zeros((b, MAX_POINTS, 4), np.float32)
        msk = np.zeros((b, MAX_POINTS), np.float32)
        imgs = np.empty((b, self.dataset.img_size, self.dataset.img_size, 3),
                        np.float32)
        ids = []
        for j, index in enumerate(indices):
            sample_id = self.dataset.sample_id_list[int(index)]
            ids.append(sample_id)
            lidar = self.dataset.get_lidar(sample_id)
            cropped = bev_mod.remove_points_outside(lidar)
            pts[j], msk[j] = bev_mod.pad_points(cropped, MAX_POINTS)
            imgs[j] = (native.rasterize_points(lidar) if native.is_available()
                       else bev_mod.make_bev_map(cropped))
        return {
            "points": pts, "point_mask": msk,
            "flip": np.zeros((b,), np.float32),
            "holes": np.zeros((b, 1, 5), np.float32),
            "hole_mask": np.zeros((b, 1), np.float32),
            "image": imgs,
            "sample_ids": np.asarray(ids, np.int64),
        }

    def _make_batch(self, indices: np.ndarray, batch_idx: int, size: int) -> Dict[str, np.ndarray]:
        if self.device_raster:
            if self.cells_raster and not self.dataset.is_test:
                return self._make_batch_deferred_cells(indices)
            if self.dataset.is_test:
                return self._make_batch_deferred_test(indices)
            batch = self._make_batch_deferred(indices, size)
            if batch is not None:
                return batch
        imgs, tgts, masks, ids = [], [], [], []
        # Sample assembly is IO + cv2 + the native rasterizer — all GIL-
        # releasing — so a thread pool parallelizes it effectively (the
        # reference used worker processes; determinism is preserved because
        # each sample's RNG is keyed by (seed, epoch, index, slot)).
        if self.workers > 1 and len(indices) > 1:
            results = list(_shared_pool().map(
                lambda ji: self._load_one(int(ji[1]), ji[0], size),
                enumerate(indices)))
        else:
            results = [self._load_one(int(index), j, size)
                       for j, index in enumerate(indices)]
        for index, (img, targets, mask) in zip(indices, results):
            imgs.append(img)
            ids.append(self.dataset.sample_id_list[int(index)])
            if targets is not None:
                tgts.append(targets)
                masks.append(mask)
        # One-pass assembly: writing each frame into the preallocated f32
        # batch converts dtype in the same copy (np.stack(...).astype(f32)
        # was two full passes over ~35 MB per batch).
        image = np.empty((len(imgs),) + imgs[0].shape, np.float32)
        for j, img in enumerate(imgs):
            image[j] = img
        batch = {
            "image": image,
            "sample_ids": np.asarray(ids, np.int64),
        }
        if tgts:
            batch["targets"] = np.stack(tgts).astype(np.float32)
            batch["target_mask"] = np.stack(masks).astype(np.float32)
        return batch

    def _iter_sync(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = self._epoch_indices()
        n_batches = len(self)
        size_rng = np.random.default_rng((self.seed, self.epoch, 7919))
        size = self.dataset.img_size
        for b in range(n_batches):
            if self.multiscale and b % _MULTISCALE_EVERY == 0:
                size = int(size_rng.choice(self.size_choices))
            chunk = indices[b * self.batch_size : (b + 1) * self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                break
            yield self._make_batch(chunk, b, size if self.multiscale else self.dataset.img_size)
        if self._dropped_cells:
            # Systematic truncation silently biases eval — surface the epoch
            # total (the first occurrence already warned with the cap).
            warnings.warn(
                f"cells-raster path dropped {self._dropped_cells} occupied "
                "cells total this epoch (per-frame capacity "
                f"{self.cell_capacity}); results are biased — raise "
                "cell_capacity", stacklevel=2)
            self._dropped_cells = 0

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.prefetch <= 0:
            yield from self._iter_sync()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error: list = []
        stop = threading.Event()

        def producer():
            try:
                for item in self._iter_sync():
                    # bounded put that notices consumer abandonment: a plain
                    # q.put would block forever when the consumer breaks out
                    # early, leaking the thread + its buffered ~35 MB batches
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # surfaced in the consumer
                error.append(e)
            finally:
                try:
                    q.put_nowait(sentinel)
                except queue.Full:
                    pass  # consumer is gone; stop is set
        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if error:
                        raise error[0]
                    return
                yield item
        finally:
            # generator closed early (break / GC): unblock and join the
            # producer so no thread or buffered batch outlives the loop
            stop.set()
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=10.0)


def create_train_loader(dataset_dir: str, batch_size: int, *,
                        num_samples: Optional[int] = None,
                        multiscale: bool = False, mosaic: bool = False,
                        random_padding: bool = False, seed: int = 2020,
                        shard_id: int = 0, num_shards: int = 1,
                        replicate_reference_bug: bool = True,
                        hflip_prob: float = 0.5, cutout_prob: float = 0.0,
                        cutout_nholes: int = 1, cutout_ratio: float = 0.3,
                        cutout_fill_value: float = 0.0,
                        device_raster: bool = False) -> BatchIterator:
    """Training pipeline with the reference augmentation recipe
    (reference: kitti_dataloader.py:22-47)."""
    ds = KittiDataset(
        dataset_dir, mode="train",
        lidar_transforms=default_lidar_transforms(replicate_reference_bug),
        aug_transforms=default_aug_transforms(
            hflip_prob, cutout_prob, cutout_nholes, cutout_ratio,
            cutout_fill_value),
        num_samples=num_samples, mosaic=mosaic, random_padding=random_padding,
    )
    return BatchIterator(ds, batch_size, shuffle=True, multiscale=multiscale,
                         seed=seed, shard_id=shard_id, num_shards=num_shards,
                         device_raster=device_raster,
                         max_holes=max(cutout_nholes, 1))


def create_val_loader(dataset_dir: str, batch_size: int, *,
                      num_samples: Optional[int] = None, seed: int = 2020,
                      shard_id: int = 0, num_shards: int = 1,
                      device_raster: bool = False,
                      cells_raster: bool = False,
                      cells_batched: bool = False,
                      cell_capacity: Optional[int] = None) -> BatchIterator:
    """Validation pipeline: no augmentation, no multiscale
    (reference: kitti_dataloader.py:50-61).

    device_raster: emit compact padded points (flip/holes inert) instead of
    host-rasterized images, for the `from_points` inference program — ~14x
    less H2D per evaluated frame.

    cells_raster: emit host-aggregated COO cells instead of points for the
    `from_cells` inference program (parity-stricter and cheaper than the
    point scatter — PERF.md r3 batch-3). Flat layout by default
    (single-device, fewest lanes); `cells_batched` selects the shardable
    (B, C) layout for mesh serving. `cell_capacity` pins the per-frame cell
    budget (default: derived from a workload sample)."""
    ds = KittiDataset(dataset_dir, mode="val", num_samples=num_samples)
    return BatchIterator(ds, batch_size, shuffle=False, drop_last=False,
                         seed=seed, shard_id=shard_id, num_shards=num_shards,
                         device_raster=device_raster,
                         cells_raster=cells_raster,
                         cells_batched=cells_batched,
                         cell_capacity=cell_capacity)


def create_test_loader(dataset_dir: str, batch_size: int, *,
                       num_samples: Optional[int] = None,
                       device_raster: bool = False) -> BatchIterator:
    """Test/demo pipeline: BEV only (reference: kitti_dataloader.py:64-76).

    device_raster: also emit compact padded points so inference can raster
    on device (`from_points`); the host image stays in the batch for
    drawing."""
    ds = KittiDataset(dataset_dir, mode="test", num_samples=num_samples)
    return BatchIterator(ds, batch_size, shuffle=False, drop_last=False,
                         prefetch=0, device_raster=device_raster)
