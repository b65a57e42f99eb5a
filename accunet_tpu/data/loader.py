"""Host batching + device feeding.

Replaces torch DataLoader (num_workers=0, /root/reference/Experiments/
train_model.py:309-339) with a deterministic epoch iterator that:
  * shuffles with an explicit per-epoch seed
  * applies joint transforms with a per-(epoch, sample) Generator — identical
    augmentation regardless of worker topology
  * emits NHWC numpy batches; `device_put_sharded` over a mesh's `data` axis
    happens in `shard` (single-device put otherwise)
  * drops the last partial batch under SPMD (static shapes for XLA) unless
    pad=True, in which case it pads by wrapping and reports the true count
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


class BatchLoader:
    """`batch_size` is always the GLOBAL batch. With
    `process_count > 1` (multi-host SPMD, SURVEY §2.6/§5.8), every process
    computes the same global shuffled order from the same (seed, epoch) and
    yields only its contiguous `batch_size/process_count` slice of each
    global batch — per-host pipelines feed per-host shards with no
    cross-host coordination, and the global batch composition is identical
    to the single-process run (deterministic by construction)."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        transform=None,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        pad_last: bool = False,
        mask_dtype=np.float32,
        process_index: int = 0,
        process_count: int = 1,
    ):
        if process_count > 1:
            if batch_size % process_count:
                raise ValueError(
                    f"global batch {batch_size} not divisible by "
                    f"process_count {process_count}"
                )
            if not (0 <= process_index < process_count):
                raise ValueError(f"process_index {process_index} out of range")
            if not (drop_last or pad_last):
                raise ValueError(
                    "multi-host sharding needs drop_last or pad_last "
                    "(static per-host shapes; a ragged final global batch "
                    "would split unevenly across processes)"
                )
        self.ds = dataset
        self.batch_size = batch_size
        self.transform = transform
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.epoch = 0
        self.mask_dtype = mask_dtype
        self.process_index = process_index
        self.process_count = process_count

    def __len__(self):
        n = len(self.ds)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[dict]:
        n = len(self.ds)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng((self.seed, self.epoch)).shuffle(order)
        bs = self.batch_size
        stop = n - n % bs if self.drop_last else n
        for start in range(0, stop, bs):
            idxs = order[start : start + bs]
            true_count = len(idxs)
            if self.pad_last and true_count < bs:
                idxs = np.concatenate([idxs, order[: bs - true_count]])
            if self.process_count > 1:
                per = bs // self.process_count
                lo = self.process_index * per
                idxs = idxs[lo : lo + per]
                true_count = min(max(true_count - lo, 0), per)
            images, labels, names = [], [], []
            for i in idxs:
                sample, fname = self.ds[int(i)]
                if self.transform is not None:
                    rng = np.random.default_rng((self.seed, self.epoch, int(i)))
                    sample = self.transform(sample, rng)
                images.append(sample["image"])
                labels.append(sample["label"])
                names.append(fname)
            mask = np.stack(labels).astype(self.mask_dtype)
            if mask.ndim == 3:
                mask = mask[..., None]  # NHWC channel dim for binary masks
            yield {
                "image": np.stack(images).astype(np.float32),
                "mask": mask,
                "names": names,
                "count": true_count,
            }
        self.epoch += 1


class PrefetchLoader:
    """Background-thread prefetch around any batch iterable.

    Replaces torch DataLoader's worker prefetch (the reference trains with
    num_workers=0, so this exceeds it): a daemon thread runs the inner
    iterator and fills a bounded queue, overlapping host-side decode/augment
    (numpy, GIL-releasing) with device compute. Determinism is untouched —
    batches arrive in the exact order the inner loader yields them; only
    their preparation is pipelined.
    """

    _END = object()

    def __init__(self, loader, depth: int = 2):
        self.loader = loader
        self.depth = depth

    def __len__(self):
        return len(self.loader)

    def set_epoch(self, epoch: int):
        if hasattr(self.loader, "set_epoch"):
            self.loader.set_epoch(epoch)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        err = []
        # consumers routinely abandon iteration early (train.py peeks one val
        # batch; --check-numerics aborts mid-epoch) — a bare q.put would then
        # block the worker forever and pin depth+1 batches in memory, so every
        # put polls this event and the generator's finally sets it
        closed = threading.Event()

        def _put(item) -> bool:
            while not closed.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for batch in self.loader:
                    if not _put(batch):
                        return
            except BaseException as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                _put(self._END)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is self._END:
                    break
                yield item
            t.join()
            if err:
                raise err[0]
        finally:
            closed.set()
