"""Host input pipeline: deterministic shuffling, parallel sample loading,
batch collation, and device prefetch.

Replaces the reference's ``torch.utils.data.DataLoader`` + per-script collate
closures (reference: scripts/train_multi.py:66-84). Decode/transform runs on
CPU worker threads (PIL releases the GIL for JPEG decode); assembled numpy
batches are transferred to the TPU ahead of time with a double-buffered
``jax.device_put`` so input never blocks the device.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, Optional

import numpy as np

# NOTE: no module-level jax import — input-worker processes (grain) unpickle
# objects from this module and must not pay (or tunnel-register) a jax import.


class Loader:
    """Deterministic, threaded batch loader.

    Per-sample RNG is derived from ``(seed, epoch, index)`` via
    ``np.random.SeedSequence`` so runs are reproducible regardless of worker
    scheduling (the reference relies on global RNG state and worker count).
    """

    def __init__(self, dataset, batch_size: int, collate_fn: Callable,
                 shuffle: bool = False, drop_last: bool = False,
                 num_workers: int = 4, seed: int = 0,
                 prefetch_batches: int = 2,
                 host_shard: Optional[tuple] = None) -> None:
        """``host_shard=(process_index, process_count)`` makes this loader
        yield only its host's contiguous slice of every (identically
        shuffled) global batch — the multi-host input pattern; combine
        shards with parallel.multihost.make_global_batch. ``batch_size``
        is the GLOBAL batch size."""
        if host_shard is not None:
            p, n = host_shard
            if batch_size % n != 0:
                raise ValueError(
                    f"global batch {batch_size} not divisible by "
                    f"{n} host processes")
        self.host_shard = host_shard
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch_batches = prefetch_batches
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_order(self, epoch: int) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch, 0xD5]))
            rng.shuffle(order)
        if self.drop_last:
            order = order[: (len(order) // self.batch_size) * self.batch_size]
        return order

    def _load_sample(self, epoch: int, index: int):
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, int(index)]))
        return self.dataset.__getitem__(int(index), rng)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        epoch = self.epoch
        self.epoch += 1
        order = self._epoch_order(epoch)
        n_batches = len(order) // self.batch_size
        rem = len(order) % self.batch_size
        if rem and not self.drop_last:
            n_batches += 1

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()

        def _put(item) -> bool:
            """Bounded put that aborts when the consumer went away
            (a plain put would block forever on a full queue)."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer() -> None:
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in range(n_batches):
                        if stop.is_set():
                            return
                        idx = order[b * self.batch_size:(b + 1) * self.batch_size]
                        if self.host_shard is not None:
                            p, n = self.host_shard
                            local = len(idx) // n
                            if local == 0:  # partial batch < host count:
                                continue    # skip consistently on all hosts
                            idx = idx[p * local:(p + 1) * local]
                        samples = list(pool.map(
                            lambda i: self._load_sample(epoch, i), idx))
                        if not _put(self.collate_fn(samples)):
                            return
                _put(None)
            except BaseException as e:  # propagate into consumer
                _put(e)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


def prefetch_to_device(iterator: Iterator[Dict[str, np.ndarray]],
                       size: int = 2,
                       sharding=None) -> Iterator[Dict]:
    """Double-buffer host batches onto the device (optionally sharded over a
    mesh), so H2D transfer overlaps with the previous step's compute."""
    import jax

    buf = []

    def put(batch):
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    for batch in iterator:
        buf.append(put(batch))
        if len(buf) >= size:
            yield buf.pop(0)
    while buf:
        yield buf.pop(0)


# ---------------------------------------------------------------------------
# collate factories (reference: scripts/train_{multi,image,profile}.py
# in-line closures)
# ---------------------------------------------------------------------------

class MultiCollate:
    """Contrastive-pretraining collate (reference: scripts/train_multi.py:66-76):
    stacked images + tokenized profiles + per-sample metadata. A picklable
    class so process-based input workers (grain) can ship it.

    ``vocab`` adds integer label ids to the batch — needed only by
    label-supervised coordination losses (ArcFace)."""

    def __init__(self, tokenizer: Callable, vocab=None) -> None:
        self.tokenizer = tokenizer
        self.vocab = vocab

    def __call__(self, samples) -> Dict[str, np.ndarray]:
        batch = {"image": np.stack([s["image"] for s in samples])}
        batch.update(self.tokenizer([s["profile"] for s in samples]))
        batch["image_shape"] = np.stack([s["image_shape"] for s in samples])
        batch["profile_len"] = np.stack([s["profile_length"] for s in samples])
        if self.vocab is not None:
            batch["label"] = self.vocab.transform(
                [s["label"] for s in samples])
        return batch


class ImageCollate:
    """Supervised image-classifier collate (reference: scripts/train_image.py:57-65)."""

    def __init__(self, vocab) -> None:
        self.vocab = vocab

    def __call__(self, samples) -> Dict[str, np.ndarray]:
        return {
            "image": np.stack([s["image"] for s in samples]),
            "label": self.vocab.transform([s["label"] for s in samples]),
            "image_shape": np.stack([s["image_shape"] for s in samples]),
        }


class ProfileCollate:
    """Supervised profile-classifier collate (reference: scripts/train_profile.py:57-65)."""

    def __init__(self, tokenizer: Callable, vocab) -> None:
        self.tokenizer = tokenizer
        self.vocab = vocab

    def __call__(self, samples) -> Dict[str, np.ndarray]:
        batch = dict(self.tokenizer([s["profile"] for s in samples]))
        batch["label"] = self.vocab.transform([s["label"] for s in samples])
        batch["profile_len"] = np.stack(
            [s["profile_length"] for s in samples])
        return batch


def multi_collate_fn(tokenizer: Callable, vocab=None) -> Callable:
    return MultiCollate(tokenizer, vocab)


def image_collate_fn(vocab) -> Callable:
    return ImageCollate(vocab)


def profile_collate_fn(tokenizer: Callable, vocab) -> Callable:
    return ProfileCollate(tokenizer, vocab)
