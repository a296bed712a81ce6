"""Threaded prefetching batch loader.

Replaces torch.utils.data.DataLoader (eval.py:122): worker threads run the
numpy/cv2/native decode+augment+mask pipeline (which releases the GIL in cv2
and the C++ library) and a bounded queue keeps batches ready ahead of the
accelerator.
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np


def collate(samples: List[Dict]) -> Dict:
    """Stack a list of sample dicts into batched numpy arrays."""
    out: Dict = {}
    first = samples[0]
    for k, v in first.items():
        if isinstance(v, np.ndarray):
            out[k] = np.stack([s[k] for s in samples])
        elif isinstance(v, list):
            out[k] = [np.stack([s[k][i] for s in samples])
                      for i in range(len(v))]
        else:
            out[k] = [s[k] for s in samples]
    return out


class DataLoader:
    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 num_workers: int = 4, seed: int = 0, drop_last: bool = False,
                 prefetch: int = 4, shard: Optional[tuple] = None):
        """`shard=(index, count)`: multi-host data sharding — this loader
        yields only every count-th sample (after the seeded global shuffle,
        which is identical on every process), so each host feeds a disjoint
        subset; `batch_size` is then the PER-PROCESS batch size."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.rng = np.random.RandomState(seed)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.shard = shard

    def _order(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        if self.shard is not None:
            idx, count = self.shard
            order = order[idx::count]
        return order

    def __len__(self):
        n = len(self.dataset)
        if self.shard is not None:
            idx, count = self.shard
            n = (n - idx + count - 1) // count
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict]:
        order = self._order()
        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        sample_q: "queue.Queue" = queue.Queue(
            maxsize=self.prefetch * self.batch_size)
        stop = threading.Event()
        task_q: "queue.Queue" = queue.Queue()
        for bi, batch in enumerate(batches):
            for pos, idx in enumerate(batch):
                task_q.put((bi, pos, int(idx)))

        def worker():
            while not stop.is_set():
                try:
                    bi, pos, idx = task_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    sample_q.put((bi, pos, self.dataset[idx]))
                except Exception as e:  # surface loader errors to consumer
                    sample_q.put((bi, pos, e))

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        try:
            pending: Dict[int, Dict[int, Dict]] = {}
            emitted = 0
            next_bi = 0
            expect = {bi: len(b) for bi, b in enumerate(batches)}
            while emitted < len(batches):
                bi, pos, item = sample_q.get()
                if isinstance(item, Exception):
                    raise item
                pending.setdefault(bi, {})[pos] = item
                while next_bi in pending and \
                        len(pending[next_bi]) == expect[next_bi]:
                    ordered = [pending[next_bi][p]
                               for p in range(expect[next_bi])]
                    pending.pop(next_bi)
                    yield collate(ordered)
                    emitted += 1
                    next_bi += 1
        finally:
            stop.set()
