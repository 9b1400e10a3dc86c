"""Threaded prefetching batch loader with per-host sharding.

Replaces the reference's DistributedSampler + webdataset WebLoader stack
(facescape.py:216-223): each host walks its own shard of a seeded global
permutation (the DistributedSampler contract), worker threads assemble items
(17 image decodes + mesh load per item — the host hot loop,
SURVEY.md section 3.1), and a bounded queue keeps batches ready so the TPU
never waits on the host.

Threads (not processes) suffice here because PIL decode + numpy release the
GIL; for full pods the same loader feeds
`parallel.mesh.global_batch_from_local`.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, Optional

import numpy as np

from morphablediffusion_tpu.data.common import collate


class _ProducerError:
    def __init__(self, exc: BaseException):
        self.exc = exc


class PrefetchLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 2,
        process_index: int = 0,
        process_count: int = 1,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        self.drop_last = drop_last

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng(self.seed + epoch).permutation(n)
        # per-host shard (DistributedSampler equivalent): strided slice
        return order[self.process_index :: self.process_count]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self.epochs()

    def epochs(self, start_epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite batch stream across epochs.

        The returned generator owns one daemon producer thread; call
        `.close()` (or exhaust/GC it) to stop the producer — callers that
        need batches repeatedly (e.g. periodic validation) must reuse ONE
        iterator, not create a fresh one per use.
        """
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            epoch = start_epoch
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    while not stop.is_set():
                        idx = self._epoch_indices(epoch)
                        for lo in range(0, len(idx), self.batch_size):
                            if stop.is_set():
                                return
                            chunk = idx[lo : lo + self.batch_size]
                            if len(chunk) < self.batch_size and self.drop_last:
                                continue
                            items = list(
                                pool.map(self.dataset.__getitem__, chunk)
                            )
                            if stop.is_set():
                                return
                            out_q.put(collate(items))
                        epoch += 1
            except BaseException as e:  # surface to the consumer, don't deadlock
                out_q.put(_ProducerError(e))

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = out_q.get()
                if isinstance(batch, _ProducerError):
                    raise RuntimeError("data producer thread failed") from batch.exc
                yield batch
        finally:
            stop.set()
            # unblock a producer stuck on a full queue so the thread can exit
            try:
                out_q.get_nowait()
            except queue.Empty:
                pass
