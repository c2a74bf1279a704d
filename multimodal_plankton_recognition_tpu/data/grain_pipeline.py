"""Grain-based input pipeline: process-parallel batch loading.

The threaded ``Loader`` saturates around a few hundred pairs/s because the
per-sample transforms are GIL-bound Python/numpy (~3.3 ms/sample
single-thread, profiled). Grain's multiprocess workers sidestep the GIL —
the JAX-native input stack — so the host can feed the multi-k pairs/s the
TPU step consumes.

Design notes:

* one *record* = one collated batch (``_BatchSource`` loads and collates a
  whole batch per ``__getitem__``), so worker processes parallelize across
  batches with no cross-process batching logic;
* ONE multi-epoch DataLoader is kept alive — worker processes spawn once,
  not per epoch; each ``__iter__`` drains exactly one epoch's batches;
* worker processes must not initialize JAX: the data modules are jax-free
  at import time, and the TPU-tunnel env vars are masked around worker
  spawn so the axon sitecustomize stays inert in children;
* determinism matches ``Loader`` exactly — identical (seed, epoch) shuffles
  and per-sample ``SeedSequence([seed, epoch, index])`` RNG, so the two
  loaders yield bit-identical batches (tested).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterator, Optional

import numpy as np

# env vars that make spawned interpreters register the TPU tunnel or import
# heavyweight backends (see /root/.axon_site/sitecustomize.py)
_WORKER_ENV_MASK = ("PALLAS_AXON_POOL_IPS",)


def _epoch_order(n: int, batch_size: int, shuffle: bool, drop_last: bool,
                 seed: int, epoch: int) -> np.ndarray:
    order = np.arange(n)
    if shuffle:
        rng = np.random.default_rng(np.random.SeedSequence([seed, epoch, 0xD5]))
        rng.shuffle(order)
    if drop_last:
        order = order[: (len(order) // batch_size) * batch_size]
    return order


class _BatchSource:
    """Random-access source whose records are collated batches, spanning
    many epochs (record r -> epoch r // batches_per_epoch)."""

    def __init__(self, dataset, batch_size: int, collate_fn: Callable,
                 shuffle: bool, drop_last: bool, seed: int,
                 batches_per_epoch: int, max_epochs: int,
                 start_record: int = 0) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.batches_per_epoch = batches_per_epoch
        self.max_epochs = max_epochs
        self.start_record = start_record
        self._order_cache: Dict[int, np.ndarray] = {}

    def __len__(self) -> int:
        return self.batches_per_epoch * self.max_epochs - self.start_record

    def _order(self, epoch: int) -> np.ndarray:
        if epoch not in self._order_cache:
            self._order_cache.clear()  # workers move forward; keep 1 epoch
            self._order_cache[epoch] = _epoch_order(
                len(self.dataset), self.batch_size, self.shuffle,
                self.drop_last, self.seed, epoch)
        return self._order_cache[epoch]

    def __getitem__(self, r: int) -> Dict[str, np.ndarray]:
        epoch, b = divmod(int(r) + self.start_record, self.batches_per_epoch)
        order = self._order(epoch)
        idx = order[b * self.batch_size:(b + 1) * self.batch_size]
        samples = []
        for i in idx:
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch, int(i)]))
            samples.append(self.dataset.__getitem__(int(i), rng))
        return self.collate_fn(samples)


class GrainLoader:
    """Drop-in alternative to ``Loader`` with persistent multiprocess
    workers. ``max_epochs`` bounds the underlying multi-epoch stream."""

    def __init__(self, dataset, batch_size: int, collate_fn: Callable,
                 shuffle: bool = False, drop_last: bool = False,
                 num_workers: int = 8, seed: int = 0,
                 prefetch_batches: int = 4,
                 host_shard: Optional[tuple] = None,
                 max_epochs: int = 10_000) -> None:
        if host_shard is not None:
            p, nproc = host_shard
            if batch_size % nproc != 0:
                raise ValueError(
                    f"global batch {batch_size} not divisible by "
                    f"{nproc} host processes")
            self._local_slice = (p, nproc)
        else:
            self._local_slice = None
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(0, num_workers)
        self.seed = seed
        self.prefetch_batches = prefetch_batches
        self.max_epochs = max_epochs
        self._iterator = None
        self._next_record = 0  # global record id the iterator will yield next
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _build_iterator(self, start_record: int = 0):
        import grain.python as gp

        source = _BatchSource(
            self.dataset, self.batch_size, self.collate_fn, self.shuffle,
            self.drop_last, self.seed, len(self), self.max_epochs,
            start_record=start_record)
        sampler = gp.IndexSampler(
            num_records=len(source), shard_options=gp.NoSharding(),
            shuffle=False, num_epochs=1, seed=self.seed)
        masked = {k: os.environ.pop(k) for k in _WORKER_ENV_MASK
                  if k in os.environ}
        prev_platforms = os.environ.get("JAX_PLATFORMS")
        os.environ["JAX_PLATFORMS"] = "cpu"  # children must never grab a TPU
        try:
            loader = gp.DataLoader(
                data_source=source, sampler=sampler, operations=(),
                worker_count=self.num_workers,
                worker_buffer_size=max(1, self.prefetch_batches))
            it = iter(loader)
            # worker processes spawn lazily at the first next(): force it
            # while the TPU-tunnel env vars are still masked, else every
            # child interpreter tries to register the TPU at startup
            import itertools
            first = next(it)
            return itertools.chain([first], it)
        finally:
            os.environ.update(masked)
            if prev_platforms is None:
                os.environ.pop("JAX_PLATFORMS", None)
            else:
                os.environ["JAX_PLATFORMS"] = prev_platforms

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self._local_slice is not None:
            yield from self._iter_host_shard()
            return
        # realign: if the previous epoch was not fully drained (consumer
        # break / exception / early stop), the persistent stream sits
        # mid-epoch — rebuild it at this epoch's first record so batches
        # stay on the deterministic (seed, epoch) schedule
        expected = self.epoch * len(self)
        if self._iterator is None or self._next_record != expected:
            self._iterator = self._build_iterator(start_record=expected)
            self._next_record = expected
        for _ in range(len(self)):
            item = next(self._iterator)
            # bookkeep BEFORE yield: a consumer that stops exactly at the
            # last batch (zip(...) never resumes the generator) must count
            # as a fully-drained epoch, not an early break
            self._next_record += 1
            if self._next_record == (self.epoch + 1) * len(self):
                self.epoch += 1
            yield item

    def _iter_host_shard(self):
        """Host-sharded mode: each host loads its contiguous slice of every
        identically-shuffled global batch (cf. Loader.host_shard)."""
        p, nproc = self._local_slice
        epoch = self.epoch
        self.epoch += 1
        order = _epoch_order(len(self.dataset), self.batch_size,
                             self.shuffle, self.drop_last, self.seed, epoch)
        for b in range(len(self)):
            idx = order[b * self.batch_size:(b + 1) * self.batch_size]
            # slice from the ACTUAL batch length so a trailing partial batch
            # (drop_last=False) divides evenly across hosts instead of giving
            # host 0 the leftovers and later hosts an empty list (matches
            # Loader.host_shard, pipeline.py)
            local = len(idx) // nproc
            if local == 0:  # partial batch smaller than host count
                continue
            idx = idx[p * local:(p + 1) * local]
            samples = []
            for i in idx:
                rng = np.random.default_rng(
                    np.random.SeedSequence([self.seed, epoch, int(i)]))
                samples.append(self.dataset.__getitem__(int(i), rng))
            yield self.collate_fn(samples)
