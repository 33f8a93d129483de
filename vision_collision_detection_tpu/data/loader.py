"""Host-side batch loader + device feed.

Replaces the reference's torch ``DataLoader`` worker processes and
``DistributedSampler`` (/root/reference/distributed_video_classifier.py:
315-341) with a thread-pool loader: the C++ decoder releases the GIL, so
threads give true parallel decode without process-spawn/pickle overhead, and
batches stream to the device through a double-buffered ``jax.device_put``
pipeline (optionally with a NamedSharding so each host feeds its mesh shard
directly).

Sharding semantics mirror DistributedSampler: epoch-seeded global
permutation, wrap-pad to a multiple of num_shards, round-robin shard slices
— so every shard sees the same number of samples (the pad+mask trick the
reference uses for eval gathers, nexar_complete_with_validation.py:838-900).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import jax
import numpy as np


def collate(samples) -> dict:
    return {
        "frames": np.stack([s["frames"] for s in samples]),
        "sensor": np.stack([s["sensor"] for s in samples]),
        "target": np.asarray([s["target"] for s in samples], dtype=np.int64),
        "id": [s["id"] for s in samples],
        "error": np.asarray([s["error"] for s in samples], dtype=bool),
        "pad": np.asarray([s.get("pad", False) for s in samples], dtype=bool),
    }


def _pad_collated(batch: dict, target: int) -> dict:
    """Grow a collated batch to `target` rows with masked dummy samples."""
    n = len(batch["id"])
    k = target - n
    out = dict(batch)
    for key in ("frames", "sensor", "target"):
        pad_row = np.zeros_like(batch[key][:1])
        out[key] = np.concatenate([batch[key]] + [pad_row] * k)
    out["id"] = list(batch["id"]) + ["__pad__"] * k
    out["error"] = np.concatenate([batch["error"], np.ones(k, bool)])
    out["pad"] = np.concatenate([batch["pad"], np.ones(k, bool)])
    return out


def _pad_sample(template: dict) -> dict:
    """Shape-compatible dummy sample; masked out of loss/metrics downstream."""
    return {
        "frames": np.zeros_like(template["frames"]),
        "sensor": np.zeros_like(template["sensor"]),
        "target": np.int64(0),
        "id": "__pad__",
        "error": True,
        "pad": True,
    }


class ClipLoader:
    """Iterable over fixed-shape numpy batches with epoch-seeded shuffling."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 8,
        prefetch_batches: int = 2,
        seed: int = 42,
        num_shards: int = 1,
        shard_index: int = 0,
        pad_partial: bool = False,
        mask_wrap: bool = False,
    ):
        """pad_partial: fill the trailing partial batch with masked dummy
        samples so every batch has identical shape — required when batches are
        sharded over a device mesh (SPMD static shapes), and the same
        pad+mask trick the reference uses for its eval all_gather
        (/root/reference/nexar_complete_with_validation.py:861-871)."""
        if num_shards < 1 or not (0 <= shard_index < num_shards):
            raise ValueError("bad shard spec")
        self.pad_partial = pad_partial
        # mask_wrap: flag the shard-equalizing wrap duplicates as pads so
        # evaluation masks + trims them (gathered metrics must not double-
        # count; the reference gen-3b trims by true sizes). Training keeps
        # them unmasked — DistributedSampler's duplicates ARE trained on.
        self.mask_wrap = mask_wrap
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch_batches = max(1, prefetch_batches)
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Reshuffle per epoch (reference train_sampler.set_epoch,
        distributed_video_classifier.py:549-550)."""
        self.epoch = epoch

    def _epoch_indices(self) -> np.ndarray:
        return self._indices_and_wrap()[0]

    def _indices_and_wrap(self):
        """→ (indices, wrap_flags): wrap rows are the DistributedSampler-
        style duplicates appended so every shard gets an equal count. They
        are flagged so evaluation can mask and trim them — otherwise
        gathered metrics double-count the wrapped samples (the reference
        gen-3b trims by true sizes, nexar_complete_with_validation.py:
        888-898; flag+trim is the static-shape equivalent)."""
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            idx = rng.permutation(idx)
        wrap = np.zeros(len(idx), bool)
        if self.num_shards > 1:
            target = -(-n // self.num_shards) * self.num_shards
            if target > n:
                idx = np.concatenate([idx, idx[: target - n]])
                wrap = np.concatenate(
                    [wrap, np.ones(target - n, bool)])
            idx = idx[self.shard_index :: self.num_shards]
            wrap = wrap[self.shard_index :: self.num_shards]
        return idx, wrap

    def _batches(self):
        idx, wrap = self._indices_and_wrap()
        n = len(idx)
        batches = []
        for i in range(0, n, self.batch_size):
            b = idx[i : i + self.batch_size]
            if len(b) < self.batch_size and self.drop_last:
                continue
            batches.append((b, wrap[i : i + self.batch_size]))
        return batches

    def __len__(self) -> int:
        n = len(self._epoch_indices())
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        if getattr(self.dataset, "supports_batch", False):
            yield from self._iter_native_batches()
        else:
            yield from self._iter_per_sample()

    def _iter_native_batches(self) -> Iterator[dict]:
        """Whole-batch fetches through the C++ batch decoder (its internal
        thread pool does the parallelism; Python only pipelines batches)."""
        batches = self._batches()
        if not batches:
            return
        ex = ThreadPoolExecutor(max_workers=2)

        def fetch(b: int):
            # num_threads=0 → the C pool sizes itself to the hardware
            # (num_workers Python threads would oversubscribe small hosts)
            return self.dataset.get_batch(batches[b][0], self.epoch,
                                          num_threads=0)

        futures: dict = {}
        try:
            depth = min(self.prefetch_batches + 1, len(batches))
            for b in range(depth):
                futures[b] = ex.submit(fetch, b)
            for b in range(len(batches)):
                if b + depth < len(batches):
                    futures[b + depth] = ex.submit(fetch, b + depth)
                batch = futures.pop(b).result()
                n = len(batch["id"])
                wrap = batches[b][1]
                if self.mask_wrap and wrap.any():
                    batch["pad"] = np.asarray(batch["pad"], bool) | wrap[:n]
                if self.pad_partial and n < self.batch_size:
                    batch = _pad_collated(batch, self.batch_size)
                yield batch
        finally:
            ex.shutdown(wait=False, cancel_futures=True)

    def _iter_per_sample(self) -> Iterator[dict]:
        batches = self._batches()
        if not batches:
            return
        ex = ThreadPoolExecutor(max_workers=self.num_workers)
        futures: dict = {}

        def submit(b: int):
            for k, i in enumerate(batches[b][0]):
                futures[(b, k)] = ex.submit(self.dataset.get, int(i),
                                            self.epoch)

        try:
            depth = min(self.prefetch_batches + 1, len(batches))
            for b in range(depth):
                submit(b)
            for b in range(len(batches)):
                if b + depth < len(batches):
                    submit(b + depth)
                samples = [futures.pop((b, k)).result()
                           for k in range(len(batches[b][0]))]
                if self.mask_wrap:
                    for k, w in enumerate(batches[b][1]):
                        if w:  # shard-equalizing duplicate → masked pad
                            samples[k] = dict(samples[k], pad=True)
                if self.pad_partial and len(samples) < self.batch_size:
                    samples += [_pad_sample(samples[0])] * (
                        self.batch_size - len(samples)
                    )
                yield collate(samples)
        finally:
            ex.shutdown(wait=False, cancel_futures=True)


def device_prefetch(
    iterator,
    sharding: Optional[jax.sharding.Sharding] = None,
    depth: int = 2,
    keys=("frames", "sensor", "target"),
):
    """Pipeline host batches onto the device from a producer thread.

    The producer thread drains the loader and issues jax.device_put while the
    consumer computes — so decode (GIL-free C), host→device transfer, and
    device compute overlap even on a single host core (the reference gets a
    weaker version of this from DataLoader workers + non_blocking
    .to(device)).
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    stop = threading.Event()
    _DONE = object()

    multihost = (
        sharding is not None
        and not getattr(sharding, "is_fully_addressable", True)
    )

    def put(batch):
        out = dict(batch)
        for k in keys:
            if multihost:
                # Each host holds a DISTINCT loader shard: assemble the
                # global array from per-process local data. A plain
                # device_put onto a non-fully-addressable sharding would
                # treat the local batch as the (identical) global array and
                # misinterpret per-host shards (jax 0.9 semantics).
                out[k] = jax.make_array_from_process_local_data(
                    sharding, np.asarray(batch[k])
                )
            else:
                out[k] = jax.device_put(batch[k], sharding)
        return out

    def _offer(item) -> bool:
        """Blocking put that aborts when the consumer went away."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in iterator:
                if stop.is_set() or not _offer(put(batch)):
                    return
            _offer(_DONE)
        except BaseException as e:  # surface errors in the consumer
            _offer(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _DONE:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # Consumer done or abandoned (e.g. mini-validation's max_batches
        # break): release the producer so threads and device buffers don't
        # leak across the many evaluate() calls of a long run.
        stop.set()
        while True:
            try:
                q.get_nowait()
            except queue.Empty:
                break
