"""Prefetching data loader (host threads -> device).

Replaces the reference's torch DataLoader(workers=8, pin_memory)
(/root/reference/base/foundation.py:482-495). Items are decoded/augmented by
a thread pool (cv2/PIL release the GIL), collated to numpy, and optionally
transferred to device asynchronously so the accelerator never waits on JPEG
decode — the double-buffered host->HBM pipeline from SURVEY §7.

PRNG discipline: item i of epoch e is augmented with
``np.random.default_rng((seed, e, i))`` — fully reproducible regardless of
worker scheduling (unlike the reference's global ``random`` in forked
workers).
"""

import queue
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional

import numpy as np

from floodseg_tpu.data.dataset import collate


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 8,
        seed: int = 0,
        prefetch: int = 2,
        device_put: Optional[Callable] = None,
        infinite: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self.device_put = device_put
        self.infinite = infinite
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng((self.seed, epoch)).shuffle(idx)
        return idx

    def _batches(self, epoch: int):
        idx = self._epoch_indices(epoch)
        n = len(idx)
        stop = n - n % self.batch_size if self.drop_last else n
        for s in range(0, stop, self.batch_size):
            yield idx[s:s + self.batch_size]

    def __iter__(self) -> Iterator:
        # claim this iteration's epoch UP FRONT: incrementing at generator
        # exit never runs when the consumer breaks early (GeneratorExit),
        # which would replay the same shuffle + augmentation stream on the
        # next pass
        start_epoch = self.epoch
        self.epoch += 1
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def load_item(epoch, i):
            rng = np.random.default_rng((self.seed, epoch, int(i)))
            return self.dataset.get(int(i), rng)

        def put(item) -> bool:
            """Queue-put that gives up when the consumer is gone."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def schedule():
            epoch = start_epoch
            while True:
                for bidx in self._batches(epoch):
                    yield epoch, bidx
                if not self.infinite:
                    return
                epoch += 1

        def producer():
            pool = ThreadPoolExecutor(max_workers=self.num_workers)
            # Item loads are submitted ACROSS upcoming batches, not just
            # within one: at batch_size=1 (the streaming predict path) a
            # within-batch-only pool degenerates to fully serial decode,
            # capping the stream at 1/get() regardless of workers. Keep
            # enough batches in flight to occupy every worker, plus the
            # prefetch margin. Collate + device_put stay in THIS single
            # thread: transfers through the tunneled runtime serialize
            # anyway (concurrent device_puts measured slower than serial),
            # and ordered delivery falls out for free.
            lookahead = (-(-self.num_workers // self.batch_size)
                         + max(self.prefetch, 1))
            pending: deque = deque()
            sched = schedule()
            try:
                while not stop.is_set():
                    while len(pending) < lookahead:
                        nxt = next(sched, None)
                        if nxt is None:
                            break
                        epoch, bidx = nxt
                        pending.append(
                            [pool.submit(load_item, epoch, int(i))
                             for i in bidx])
                    if not pending:
                        break
                    items = [f.result() for f in pending.popleft()]
                    batch = collate(items)
                    if self.device_put is not None:
                        batch = self.device_put(batch)
                    if not put(batch):
                        return
            except BaseException as e:  # surface errors to the consumer
                put(("__error__", e))
            finally:
                for futs in pending:
                    for f in futs:
                        f.cancel()
                put(None)
                pool.shutdown(wait=False)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    break
                if isinstance(batch, tuple) and len(batch) == 2 and batch[0] == "__error__":
                    raise RuntimeError("DataLoader worker failed") from batch[1]
                yield batch
        finally:
            stop.set()
            # drain so the producer can exit
            while not out_q.empty():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break
