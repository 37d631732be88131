"""Host-side batch loading with threaded decode and device prefetch.

Replaces the reference's torch DataLoader worker processes
(train.py:128-142) with a thread pool (decode releases the GIL inside
PIL/cv2) and adds what the reference lacks: an async device-put prefetcher
so the accelerator never waits on host I/O — batch N+1 is decoded and
transferred while batch N computes (SURVEY §7.3 "Host I/O vs device
speed").
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterable, Iterator, List

import numpy as np

# Keys that hold per-sample python/str metadata rather than stackable arrays.
_META_KEYS = ("path", "defect_type", "video")


def collate(samples: List[Dict]) -> Dict[str, Any]:
    """Stack a list of sample dicts into one batch dict."""
    batch: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if key in _META_KEYS:
            batch[key] = vals
        else:
            batch[key] = np.stack(vals)
    return batch


class Loader:
    """Batched iterator over an indexable dataset.

    Args:
        dataset: object with __len__ and __getitem__ -> dict.
        batch_size: samples per batch (final partial batch is kept).
        shuffle: reshuffle indices each epoch (seeded, epoch-dependent).
        num_workers: decode threads (0 = synchronous).
        drop_remainder: drop the final partial batch (useful for fixed
            jit shapes / even device sharding).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        num_workers: int = 4,
        seed: int = 0,
        drop_remainder: bool = False,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(0, num_workers)
        self.seed = seed
        self.drop_remainder = drop_remainder
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        indices = self._epoch_indices()
        self._epoch += 1
        n = len(indices)
        limit = (n // self.batch_size) * self.batch_size if self.drop_remainder else n
        chunks = [
            indices[i : i + self.batch_size] for i in range(0, limit, self.batch_size)
        ]
        if not chunks:
            return
        if self.num_workers == 0:
            for chunk in chunks:
                yield collate([self.dataset[int(i)] for i in chunk])
            return
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            # Pipeline: keep decode FUTURES for up to `ahead` batches in
            # flight; only collect results when a batch is consumed, so
            # batch N+1 decodes while the caller processes batch N.
            pending = []
            ahead = 2
            it = iter(chunks)

            def submit(chunk):
                return [pool.submit(self.dataset.__getitem__, int(i)) for i in chunk]

            try:
                for _ in range(ahead):
                    pending.append(submit(next(it)))
            except StopIteration:
                pass
            for chunk in it:
                futures = pending.pop(0)
                pending.append(submit(chunk))
                yield collate([f.result() for f in futures])
            for futures in pending:
                yield collate([f.result() for f in futures])


def device_prefetch(iterable: Iterable[Dict], size: int = 2) -> Iterator[Dict]:
    """Move batches to device asynchronously, `size` batches ahead.

    jax.device_put is async; the queue bounds host memory while keeping
    the accelerator fed (double buffering with size=2).
    Non-array metadata passes through untouched.
    """
    import jax

    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()
    err: List[BaseException] = []

    def put(batch: Dict) -> Dict:
        out = {}
        for k, v in batch.items():
            out[k] = jax.device_put(v) if isinstance(v, np.ndarray) else v
        return out

    def producer() -> None:
        try:
            for batch in iterable:
                q.put(put(batch))
        except BaseException as e:  # noqa: BLE001 - surfaced to consumer
            err.append(e)
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
