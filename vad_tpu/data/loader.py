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


class DistributedLoader:
    """Mesh-aware batched iterator: the trainers' input path.

    Every process loads ONLY its own contiguous slice of each global
    batch (the multi-host feeding contract, vad_tpu.parallel.multihost)
    and assembles the global batch-sharded jax.Array via
    `put_global_batch` — so `python train.py` IS the distributed program:
    at process_count == 1 this degenerates exactly to decode-everything +
    one sharded device_put, and on a multi-host slice each host decodes
    1/P of every batch with no code change.  Replaces the reference's
    single-device DataLoader + `.to(device)` (train.py:128-146).

    Yields ``(batch, n_real)``: array fields become global jax.Arrays
    sharded over the mesh 'data' axis, ``n_real`` counts the REAL samples
    (the index list of each batch is padded to ``pad_to`` by cycling its
    real indices, keeping jit shapes static; callers mask the padded
    tail via n_real exactly as with `pad_batch_for_devices`.  Cycling —
    not repeating the last index — makes a padded tail batch's
    train-mode BatchNorm statistics exactly the unpadded batch's
    whenever pad_to % n_real == 0, so training THROUGH the tail matches
    the reference's short-last-batch procedure, torch train.py:128-134).

    Args:
        dataset: object with __len__ and __getitem__ -> dict.
        batch_size: REAL samples consumed per global step.
        mesh: the device mesh batches are sharded over.
        pad_to: static global batch shape (default: batch_size rounded up
            to a multiple of the mesh data axis).
        shuffle/seed: epoch-seeded global permutation — identical on
            every host (the permutation is metadata, not data).
        drop_remainder: skip the final partial batch.
        process_count/process_index: override the jax process topology
            (tests simulate host k of P in a single process; requires
            assemble=False since no real global array can be built).
        assemble: when False, yield the host-LOCAL numpy arrays instead
            of global jax.Arrays (testing the slice path).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        mesh,
        pad_to: int | None = None,
        shuffle: bool = False,
        num_workers: int = 4,
        seed: int = 0,
        drop_remainder: bool = False,
        process_count: int | None = None,
        process_index: int | None = None,
        assemble: bool = True,
    ) -> None:
        from vad_tpu.parallel.sharding import padded_batch_size

        self.dataset = dataset
        self.batch_size = batch_size
        self.mesh = mesh
        self.pad_to = pad_to if pad_to is not None else padded_batch_size(batch_size, mesh)
        self.shuffle = shuffle
        self.num_workers = max(0, num_workers)
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.process_count = process_count
        self.process_index = process_index
        self.assemble = assemble
        if assemble and (process_count is not None or process_index is not None):
            raise ValueError("explicit process topology requires assemble=False")
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_plan(self) -> List:
        """[(local_indices, n_real)] for every global batch this epoch."""
        from vad_tpu.parallel.multihost import owned_batch_positions

        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        n_batches = len(self)
        # mesh-aware ownership: the contiguous slice on a process-grouped
        # mesh, every participating row block on a cross-process-tp mesh
        pos = owned_batch_positions(
            self.mesh, self.pad_to, self.process_count, self.process_index
        )
        plan = []
        for step in range(n_batches):
            lo = step * self.batch_size
            real = min(self.batch_size, n - lo)
            idx = order[lo : lo + real]
            if real < self.pad_to:
                # pad by CYCLING the real indices (np.resize), not repeating
                # the last one: train-mode BatchNorm normalizes the padded
                # batch with statistics over the duplicated multiset, and
                # cycling makes those stats EQUAL to the unpadded batch's
                # whenever pad_to % n_real == 0 (every copy count equal) —
                # e.g. the 50-image fixtures' 2-sample tail at pad_to=16.
                # The loss itself is masked to the first n_real either way.
                idx = np.resize(idx, self.pad_to)
            plan.append((idx[pos], real))
        return plan

    def _finish(self, samples: List[Dict], n_real: int):
        from vad_tpu.parallel.multihost import put_global_batch

        arrays = collate(samples)
        if self.assemble:
            arrays = put_global_batch(self.mesh, arrays, self.pad_to)
        return arrays, n_real

    def __iter__(self) -> Iterator:
        plan = self._epoch_plan()
        self._epoch += 1
        if not plan:
            return
        if self.num_workers == 0:
            for local_idx, n_real in plan:
                yield self._finish([self.dataset[int(i)] for i in local_idx], n_real)
            return
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            # same decode pipeline as Loader: futures for up to 2 batches
            # stay in flight while the caller consumes batch N
            pending = []
            ahead = 2
            it = iter(plan)

            def submit(item):
                local_idx, n_real = item
                return (
                    [pool.submit(self.dataset.__getitem__, int(i)) for i in local_idx],
                    n_real,
                )

            try:
                for _ in range(ahead):
                    pending.append(submit(next(it)))
            except StopIteration:
                pass
            for item in it:
                futures, n_real = pending.pop(0)
                pending.append(submit(item))
                yield self._finish([f.result() for f in futures], n_real)
            for futures, n_real in pending:
                yield self._finish([f.result() for f in futures], n_real)


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
