"""Input pipeline: split wiring, host batching, and device prefetch.

The datamodule equivalent of reference s2osm_datamodule.py /
mae_datamodule.py, rebuilt for a TPU input path:

  host thread:  memmap gather -> random/center crop (numpy slice)
  prefetch:     background device_put onto the data-parallel sharding
  device:       flips + normalize fused into the jit'd step (data.augment)

Eval batches are padded to the static batch size with a validity mask so
every XLA program has a single shape (no recompiles, correct metrics).
"""

from __future__ import annotations

import queue
import threading
import typing

import jax
import numpy as np

from s2tpu.configs.segmentation import DatamoduleConfig
from s2tpu.data.dataset import (
    PackedSource,
    SegmentSource,
    TiffSource,
    train_val_test_split,
)
from s2tpu.data import statistics


class HostBatch(typing.NamedTuple):
    images: np.ndarray  # (B, crop, crop, C) int16
    labels: np.ndarray  # (B, crop, crop) int32
    mask: np.ndarray  # (B,) bool — False entries are padding


def epoch_rng(seed, epoch: int, overfit_batches: int) -> np.random.Generator:
    """Per-epoch generator; the overfit preset pins one seed across epochs so
    both sample order and crops are identical every epoch."""
    return np.random.default_rng(seed if overfit_batches > 0 else (seed, epoch))


def sample_epoch_order(
    rng: np.random.Generator,
    train_idx: np.ndarray,
    sample_weights: np.ndarray | None,
    batch_size: int,
    overfit_batches: int,
) -> tuple[np.ndarray, int]:
    """One epoch's sample order: shuffled, or weighted-with-replacement when
    per-sample weights exist; returns (order, n_drop_last_batches).

    Single source of truth for both the host pipeline and the device-corpus
    trainer loop (they must never drift — same preset, same order).
    """
    if sample_weights is not None:
        w = sample_weights[train_idx]
        order = rng.choice(train_idx, size=len(train_idx), replace=True, p=w / w.sum())
    else:
        order = rng.permutation(train_idx)
    n_batches = len(order) // batch_size
    if overfit_batches > 0:
        n_batches = min(overfit_batches, max(n_batches, 1))
        order = np.concatenate([order] * max(1, batch_size * n_batches // max(len(order), 1) + 1))
    return order, n_batches


class Datamodule:
    """Builds sources, splits, statistics, and batch iterators for one config.

    Under multi-host (DCN) training every process constructs the same
    Datamodule (same seeds -> same epoch order, crops, flips) and feeds only
    its ``process_index`` slice of each global batch; the trainer assembles
    the global array (s2tpu.parallel.multihost). Pass process_count/index
    explicitly for tests; they default to the jax runtime's values.
    """

    def __init__(
        self,
        cfg: DatamoduleConfig,
        source: SegmentSource | None = None,
        process_count: int | None = None,
        process_index: int | None = None,
    ) -> None:
        self.cfg = cfg
        self.n_proc = process_count if process_count is not None else jax.process_count()
        self.proc = process_index if process_index is not None else jax.process_index()
        assert cfg.batch_size % self.n_proc == 0, (
            f"global batch {cfg.batch_size} must divide process count {self.n_proc}"
        )
        ds = cfg.dataset_cfg
        self.source = (
            source
            if source is not None
            else TiffSource(ds.aoi, ds.label_map, ds.data_dir, n_time_frames=ds.n_time_frames)
        )
        self.train_idx, self.val_idx, self.test_idx = train_val_test_split(
            len(self.source), cfg.data_split, seed=cfg.shuffle_seed
        )
        self._mean_std: tuple[np.ndarray, np.ndarray] | None = None
        self._rng = np.random.default_rng(cfg.shuffle_seed)
        self._sample_weights: np.ndarray | None = None
        if cfg.class_distribution is not None:
            self._sample_weights = statistics.get_sample_weights(
                self.source, np.asarray(cfg.class_distribution), ignore_zero_label=True
            )

    # -- statistics ---------------------------------------------------------
    def mean_std(self) -> tuple[np.ndarray, np.ndarray]:
        if self._mean_std is None:
            stats = statistics.calculate_mean_std(self.source)
            self._mean_std = (
                np.asarray(stats["mean"], np.float32),
                np.asarray(stats["std"], np.float32),
            )
        return self._mean_std

    def set_mean_std(self, mean: np.ndarray, std: np.ndarray) -> None:
        self._mean_std = (np.asarray(mean, np.float32), np.asarray(std, np.float32))

    # -- batching -----------------------------------------------------------
    def _sample_hw(self) -> tuple[int, int]:
        s = self.source[0]
        return s.x.shape[-3], s.x.shape[-2]

    def _gather_crops(
        self,
        indices: np.ndarray,
        ys: np.ndarray,
        xs: np.ndarray,
        flip_h: np.ndarray | None = None,
        flip_v: np.ndarray | None = None,
    ) -> HostBatch:
        crop = self.cfg.random_crop_size
        n = len(indices)
        # Packed sources take the native multithreaded gather (C++ memcpy
        # rows straight out of the memmap, flips applied during the copy;
        # s2tpu/native/gather.cc).
        if isinstance(self.source, PackedSource):
            from s2tpu import native

            gathered = native.gather_crops(
                self.source.images, self.source.labels, np.asarray(indices), ys, xs, crop,
                flip_h=flip_h, flip_v=flip_v,
            )
            if gathered is not None:
                images, labels = gathered
                return HostBatch(images, labels, np.ones(n, dtype=bool))
        first = self.source[int(indices[0])]
        c = first.x.shape[-1]
        # Multi-temporal samples are (T, H, W, C) -> batch (B, T, crop, crop, C).
        lead = first.x.shape[:-3]
        images = np.empty((n, *lead, crop, crop, c), dtype=np.int16)
        labels = np.empty((n, crop, crop), dtype=np.int32)
        for k, (i, y0, x0) in enumerate(zip(indices, ys, xs)):
            s = self.source[int(i)]
            img = s.x[..., y0 : y0 + crop, x0 : x0 + crop, :]
            lbl = s.y[y0 : y0 + crop, x0 : x0 + crop]
            if flip_h is not None and flip_h[k]:
                img, lbl = img[..., :, ::-1, :], lbl[:, ::-1]
            if flip_v is not None and flip_v[k]:
                img, lbl = img[..., ::-1, :, :], lbl[::-1, :]
            images[k] = img
            labels[k] = lbl
        return HostBatch(images, labels, np.ones(n, dtype=bool))

    def train_batches(
        self, epoch: int, overfit_batches: int = 0, start: int = 0
    ) -> typing.Iterator[HostBatch]:
        """One epoch of shuffled, randomly-cropped, drop-last train batches.

        ``start`` skips the first batches WITHOUT loading their images (the
        per-batch RNG draws still advance, keeping the stream identical) —
        mid-epoch preemption resume is O(skip) cheap draws, not O(skip)
        full batch loads."""
        bs = self.cfg.batch_size
        rng = epoch_rng(self.cfg.shuffle_seed, epoch, overfit_batches)
        order, n_batches = sample_epoch_order(
            rng, self.train_idx, self._sample_weights, bs, overfit_batches
        )
        hw = self._sample_hw()
        do_host_flips = self.cfg.host_flips and self.cfg.augment and overfit_batches == 0
        for b in range(n_batches):
            idx = order[b * bs : (b + 1) * bs]
            flip_h = flip_v = None
            if self.cfg.augment and overfit_batches == 0:
                ys = rng.integers(0, hw[0] - self.cfg.random_crop_size + 1, size=bs)
                xs = rng.integers(0, hw[1] - self.cfg.random_crop_size + 1, size=bs)
                if do_host_flips:
                    flip_h = rng.random(bs) < self.cfg.random_horizontal_flip_p
                    flip_v = rng.random(bs) < self.cfg.random_vertical_flip_p
            else:
                y0 = (hw[0] - self.cfg.random_crop_size) // 2
                x0 = (hw[1] - self.cfg.random_crop_size) // 2
                ys = np.full(bs, y0)
                xs = np.full(bs, x0)
            if b < start:
                continue  # replay the draw stream only
            if self.n_proc > 1:
                # Same global draws on every process; gather only our shard.
                sl = self._local_slice(bs)
                idx, ys, xs = idx[sl], ys[sl], xs[sl]
                flip_h = flip_h[sl] if flip_h is not None else None
                flip_v = flip_v[sl] if flip_v is not None else None
            yield self._gather_crops(idx, ys, xs, flip_h=flip_h, flip_v=flip_v)

    def _local_slice(self, global_bs: int) -> slice:
        per = global_bs // self.n_proc
        return slice(self.proc * per, (self.proc + 1) * per)

    def eval_batches(self, split: str = "val") -> typing.Iterator[HostBatch]:
        """Center-cropped eval batches, padded to a static batch size."""
        bs = self.cfg.batch_size * self.cfg.val_batch_size_multiplier
        indices = {"val": self.val_idx, "test": self.test_idx, "train": self.train_idx}[split]
        hw = self._sample_hw()
        y0 = (hw[0] - self.cfg.random_crop_size) // 2
        x0 = (hw[1] - self.cfg.random_crop_size) // 2
        for b in range(0, len(indices), bs):
            idx = indices[b : b + bs]
            mask = np.ones(len(idx), dtype=bool)
            if self.n_proc > 1:
                # Pad to the global batch first so every process sees the
                # same batch geometry, then gather only our shard.
                pad_idx = np.concatenate([idx, np.zeros(bs - len(idx), idx.dtype)])
                mask = np.concatenate([mask, np.zeros(bs - len(idx), bool)])
                sl = self._local_slice(bs)
                idx, mask = pad_idx[sl], mask[sl]
                batch = self._gather_crops(idx, np.full(len(idx), y0), np.full(len(idx), x0))
                yield HostBatch(batch.images, batch.labels, mask)
                continue
            batch = self._gather_crops(idx, np.full(len(idx), y0), np.full(len(idx), x0))
            if len(idx) < bs:
                pad = bs - len(idx)
                batch = HostBatch(
                    np.concatenate([batch.images, np.zeros((pad, *batch.images.shape[1:]), batch.images.dtype)]),
                    np.concatenate([batch.labels, np.zeros((pad, *batch.labels.shape[1:]), batch.labels.dtype)]),
                    np.concatenate([batch.mask, np.zeros(pad, dtype=bool)]),
                )
            yield batch


def prefetch_to_device(
    iterator: typing.Iterator[HostBatch],
    sharding: jax.sharding.Sharding | None = None,
    depth: int = 2,
) -> typing.Iterator[HostBatch]:
    """Background-thread device_put pipeline (double-buffered H2D transfers).

    Producer exceptions propagate to the consumer (re-raised from the
    training loop) instead of silently truncating the epoch.
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = object()
    error: list[BaseException] = []

    def produce() -> None:
        try:
            from s2tpu.parallel.multihost import put_batch

            for batch in iterator:
                if sharding is not None:
                    # put_batch assembles the global array from this
                    # process's local shard under multi-host.
                    batch = HostBatch(*(put_batch(np.asarray(a), sharding) for a in batch))
                else:
                    batch = HostBatch(*(jax.device_put(a) for a in batch))
                q.put(batch)
        except BaseException as e:  # noqa: BLE001 — relayed to the consumer
            error.append(e)
        finally:
            q.put(stop)

    thread = threading.Thread(target=produce, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is stop:
            if error:
                raise error[0]
            return
        yield item
