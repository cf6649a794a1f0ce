"""Device-resident training corpus: the whole packed dataset lives in HBM.

BASELINE.json's north star calls for "XLA-compiled transforms feeding
device-resident batches" — this is that component. The packed (N, H, W, C)
int16 corpus is uploaded to device memory ONCE (e.g. the full "fr" AOI at
12.4k segments is ~9.7 GB — fits v5e HBM next to B5 training state); per
step the host sends only three small int32 vectors (segment indices, crop
offsets), and the crop gather happens on device inside the jit'd train step.

This removes the per-step host->device image transfer entirely — decisive
when the link is slow (measured 40 MB/s through this environment's TPU
relay, which caps streamed training at ~70 img/s vs the 439 img/s device
rate) and still a latency win on local PCIe hosts.

Multi-chip note: under a data mesh the corpus is replicated per device by
default; for corpora beyond per-chip HBM, shard segments over 'data' and
sample per-shard indices (round-robin by host) — hook left in sharding arg.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from s2tpu.data.dataset import PackedSource, SegmentSource


class DeviceCorpus:
    """Packed dataset uploaded to device memory, with on-device crop gather."""

    def __init__(
        self,
        source: SegmentSource,
        sharding: jax.sharding.Sharding | None = None,
    ) -> None:
        if isinstance(source, PackedSource):
            images = np.asarray(source.images)
            labels = np.asarray(source.labels)
        else:
            first = source[0]
            n = len(source)
            images = np.empty((n, *first.x.shape), np.int16)
            labels = np.empty((n, *first.y.shape), np.uint8)
            for i in range(n):
                s = source[i]
                images[i] = s.x
                labels[i] = s.y
        self.n = images.shape[0]
        self.hw = images.shape[1:3]
        put = (lambda a: jax.device_put(a, sharding)) if sharding is not None else jax.device_put
        self.images = put(images)  # (N, H, W, C) int16 in HBM
        self.labels = put(labels.astype(np.int32))  # (N, H, W)

    def gather(self, idx: jax.Array, ys: jax.Array, xs: jax.Array, crop: int):
        """On-device crop gather: (B,) indices/offsets -> (B, crop, crop, C), (B, crop, crop).

        Pure jnp — call inside the jit'd train step.
        """

        def one(i, y, x):
            img = jax.lax.dynamic_slice(
                self.images, (i, y, x, 0), (1, crop, crop, self.images.shape[3])
            )[0]
            lbl = jax.lax.dynamic_slice(self.labels, (i, y, x), (1, crop, crop))[0]
            return img, lbl

        return jax.vmap(one)(idx, ys, xs)


def sample_crop_batch(
    rng: np.random.Generator,
    order: np.ndarray,
    step: int,
    batch_size: int,
    hw: tuple[int, int],
    crop: int,
    random_crop: bool = True,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side index/offset sampling for one step (three tiny int32 arrays)."""
    idx = order[step * batch_size : (step + 1) * batch_size].astype(np.int32)
    if random_crop:
        ys = rng.integers(0, hw[0] - crop + 1, size=batch_size).astype(np.int32)
        xs = rng.integers(0, hw[1] - crop + 1, size=batch_size).astype(np.int32)
    else:
        ys = np.full(batch_size, (hw[0] - crop) // 2, np.int32)
        xs = np.full(batch_size, (hw[1] - crop) // 2, np.int32)
    return idx, ys, xs
