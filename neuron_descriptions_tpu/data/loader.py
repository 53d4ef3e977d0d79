"""Threaded batch loader with device prefetch.

Replaces torch ``DataLoader(num_workers=30)`` (reference:
src/deps/netdissect/tally.py:676-692, src/exemplars/compute.py:34-37) with
a thread-pool batch assembler + bounded prefetch queue. Decoding is
CPU-bound PIL/numpy work that releases the GIL, so threads scale well and
the TPU pipeline sees a steady stream of ready host batches.
"""
import concurrent.futures
import queue
import threading
from typing import Any, Callable, Iterator, Optional, Sequence

import numpy as np

__all__ = ["batches", "Loader"]


def _default_collate(items: Sequence[Any]) -> Any:
    first = items[0]
    if isinstance(first, np.ndarray):
        return np.stack(items)
    if isinstance(first, (int, float, np.integer, np.floating)):
        return np.asarray(items)
    if isinstance(first, (tuple, list)):
        return tuple(_default_collate([item[i] for item in items])
                     for i in range(len(first)))
    return list(items)


class Loader:
    """Iterate a dataset in batches with parallel item loading.

    Args:
        dataset: Anything with ``__len__`` and ``__getitem__``.
        batch_size: Max items per batch (final batch may be smaller).
        num_workers: Thread-pool size for item loading (0 = synchronous).
        prefetch: Number of ready batches to buffer ahead.
        indices: Optional fixed index order (the gather pass visits only
            top-image ids, reference: tally.py:109-119).
        collate: Batch assembly function.
    """

    def __init__(self,
                 dataset: Any,
                 batch_size: int = 128,
                 num_workers: int = 16,
                 prefetch: int = 4,
                 indices: Optional[Sequence[int]] = None,
                 collate: Callable[[Sequence[Any]], Any] = _default_collate):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.indices = (list(range(len(dataset)))
                        if indices is None else list(indices))
        self.collate = collate

    def __len__(self) -> int:
        return -(-len(self.indices) // self.batch_size)

    def _load_batch(self, pool, batch_indices) -> Any:
        if pool is None:
            items = [self.dataset[i] for i in batch_indices]
        else:
            items = list(pool.map(self.dataset.__getitem__, batch_indices))
        return self.collate(items)

    def __iter__(self) -> Iterator[Any]:
        chunks = [
            self.indices[i:i + self.batch_size]
            for i in range(0, len(self.indices), self.batch_size)
        ]
        if self.num_workers <= 0:
            for chunk in chunks:
                yield self._load_batch(None, chunk)
            return

        out: "queue.Queue" = queue.Queue(maxsize=max(1, self.prefetch))
        sentinel = object()
        error: list = []
        stop = threading.Event()

        def bounded_put(item) -> bool:
            """Put that also watches the stop flag, so an abandoned consumer
            can never strand this thread on a full queue. Returns False if
            stopped before the item was enqueued."""
            while not stop.is_set():
                try:
                    out.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer() -> None:
            try:
                with concurrent.futures.ThreadPoolExecutor(
                        self.num_workers) as pool:
                    for chunk in chunks:
                        if not bounded_put(self._load_batch(pool, chunk)):
                            return
            except BaseException as exc:  # propagate to consumer
                error.append(exc)
            finally:
                # The sentinel MUST reach the consumer (or the consumer must
                # have stopped); a dropped sentinel would deadlock out.get().
                bounded_put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out.get()
                if item is sentinel:
                    break
                yield item
        finally:
            # Runs on exhaustion AND on early abandonment (GeneratorExit).
            stop.set()
            while True:
                try:
                    out.get_nowait()
                except queue.Empty:
                    break
            thread.join()
        if error:
            raise error[0]


def batches(dataset: Any, batch_size: int = 128, **kwargs: Any
            ) -> Iterator[Any]:
    """Convenience wrapper: iterate dataset batches."""
    return iter(Loader(dataset, batch_size=batch_size, **kwargs))
