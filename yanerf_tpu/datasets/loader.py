"""Host-side data pipeline: process-sharded epoch sampling + threaded prefetch.

Replaces the reference's ``torch.utils.data.DataLoader`` +
``DistributedSampler`` stack (reference runners/utils.py:112-145) with a
TPU-friendly design:
  * ``ShardedEpochSampler`` reproduces DistributedSampler semantics exactly —
    per-epoch seeded shuffle, wraparound padding so every process sees
    ``ceil(N / world) `` samples, ``set_epoch`` reshuffling — but keyed on
    ``jax.process_index/count`` instead of torch.distributed ranks;
  * ``DataLoader`` stacks items into contiguous numpy batches on worker
    threads and prefetches ahead of the training step, so host IO overlaps
    device compute (the torch worker-process + pinned-memory pipeline has no
    TPU analog — transfers go through ``jax.device_put`` on dispatch).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, List, Optional, Sequence

import numpy as np


def get_process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def get_process_count() -> int:
    try:
        import jax

        return jax.process_count()
    except Exception:
        return 1


class ShardedEpochSampler:
    """DistributedSampler-equivalent index sharding across processes."""

    def __init__(
        self,
        dataset_len: int,
        shuffle: bool,
        world_size: Optional[int] = None,
        rank: Optional[int] = None,
        seed: int = 0,
    ) -> None:
        self.dataset_len = dataset_len
        self.shuffle = shuffle
        self.world_size = world_size if world_size is not None else get_process_count()
        self.rank = rank if rank is not None else get_process_index()
        self.seed = seed
        self.epoch = 0
        self.num_samples = -(-dataset_len // self.world_size)
        self.total_size = self.num_samples * self.world_size

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def indices(self) -> np.ndarray:
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            order = rng.permutation(self.dataset_len)
        else:
            order = np.arange(self.dataset_len)
        # wraparound padding so the shard sizes are equal
        if self.total_size > len(order):
            order = np.concatenate([order, order[: self.total_size - len(order)]])
        return order[self.rank : self.total_size : self.world_size]

    def __len__(self) -> int:
        return self.num_samples


def stack_batch(items: Sequence) -> tuple:
    """Stack a list of per-item tuples of numpy arrays into batch arrays.

    Non-array fields follow the reference's ``collate_only_array`` rules
    (runners/utils.py:302-346): floats are averaged, ints/strings keep the
    first / the list, None passes through.
    """
    first = items[0]
    out: List = []
    for field_idx in range(len(first)):
        values = [item[field_idx] for item in items]
        v0 = values[0]
        if isinstance(v0, np.ndarray):
            out.append(np.stack(values, axis=0))
        elif np.isscalar(v0) and isinstance(v0, (float, np.floating)):
            out.append(float(np.mean(values)))
        elif isinstance(v0, (int, np.integer)):
            out.append(values[0])
        elif isinstance(v0, str) or v0 is None:
            out.append(values if isinstance(v0, str) else None)
        else:
            out.append(np.stack([np.asarray(v) for v in values], axis=0))
    return tuple(out)


class DataLoader:
    """Iterates batches as stacked numpy tuples with background prefetch."""

    def __init__(
        self,
        dataset,
        sampler: Optional[ShardedEpochSampler],
        batch_size: int,
        is_train: bool,
        num_workers: int = 2,
        prefetch_depth: int = 2,
        collate_fn: Optional[Callable] = None,
    ) -> None:
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.drop_last = bool(is_train)
        self.is_train = is_train
        self.num_workers = max(0, num_workers)
        self.prefetch_depth = max(1, prefetch_depth)
        self.collate_fn = collate_fn or stack_batch
        self._pool = None  # lazy ThreadPoolExecutor for num_workers > 1

    @property
    def data_wrapper(self):
        return self.dataset.data_wrapper

    def _batch_indices(self) -> List[np.ndarray]:
        if self.sampler is not None:
            indices = self.sampler.indices()
        else:
            indices = np.arange(len(self.dataset))
            if self.is_train:
                indices = np.random.permutation(indices)
        batches = []
        for start in range(0, len(indices), self.batch_size):
            chunk = indices[start : start + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                continue
            batches.append(chunk)
        return batches

    def __len__(self) -> int:
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _load_batch(self, idx_chunk: np.ndarray):
        # num_workers > 1 fans the per-item loads (image decode releases
        # the GIL in the native decoder) across a thread pool; batch order
        # is preserved by executor.map
        if self.num_workers > 1:
            if self._pool is None:
                from concurrent.futures import ThreadPoolExecutor

                self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
            items = list(self._pool.map(self.dataset.__getitem__, (int(i) for i in idx_chunk)))
        else:
            items = [self.dataset[int(i)] for i in idx_chunk]
        return self.collate_fn(items)

    def __iter__(self) -> Iterator[tuple]:
        batches = self._batch_indices()
        if self.num_workers == 0:
            for chunk in batches:
                yield self._load_batch(chunk)
            return

        out_queue: "queue.Queue" = queue.Queue(maxsize=self.prefetch_depth)
        stop = threading.Event()

        def _put(item) -> bool:
            # a bare put() on the bounded queue would block forever if the
            # consumer abandons iteration while the queue is full (the
            # finally-block's stop.set() cannot unblock it) — poll instead
            while not stop.is_set():
                try:
                    out_queue.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def _producer():
            try:
                for chunk in batches:
                    if stop.is_set():
                        return
                    if not _put(("ok", self._load_batch(chunk))):
                        return
                _put(("done", None))
            except Exception as exc:  # propagate loader errors to the consumer
                _put(("err", exc))

        worker = threading.Thread(target=_producer, daemon=True)
        worker.start()
        try:
            while True:
                kind, payload = out_queue.get()
                if kind == "done":
                    return
                if kind == "err":
                    raise payload
                yield payload
        finally:
            stop.set()


def create_sampler(dataset, shuffle: bool, world_size: Optional[int] = None, rank: Optional[int] = None, seed: int = 0):
    return ShardedEpochSampler(len(dataset), shuffle=shuffle, world_size=world_size, rank=rank, seed=seed)


def create_loader(
    dataset,
    sampler: Optional[ShardedEpochSampler],
    batch_size: int,
    num_workers: int,
    is_train: bool,
    collate_fn: Optional[Callable] = None,
    **_compat_kwargs,
) -> DataLoader:
    return DataLoader(
        dataset,
        sampler,
        batch_size=batch_size,
        is_train=is_train,
        num_workers=num_workers,
        collate_fn=collate_fn,
    )


class Subset:
    """Dataset view over a subset of indices (debug mode)."""

    def __init__(self, dataset, indices: Sequence[int]):
        self.dataset = dataset
        self.indices = list(indices)
        self.data_wrapper = dataset.data_wrapper

    def __getitem__(self, idx: int):
        return self.dataset[self.indices[idx]]

    def __len__(self) -> int:
        return len(self.indices)


_U8_DECODE_TABLE = np.arange(256, dtype=np.float32) / 255.0  # exact k/255 values


def decode_cached_field(a):
    """Decode one device-cache field: ``uint8`` means a lossless-quantized
    unit-interval image (see ``DeviceCachedLoader``); everything else passes
    through. Decodes through a 256-entry table of host-computed k/255
    values, which reproduces the loaders' ``astype(float32) / 255.0``
    BIT-for-bit even under jit — an in-program ``x / 255.0`` would not:
    XLA's algebraic simplifier rewrites divide-by-constant into a
    reciprocal multiply, off by 1 ulp for some bytes. The table is a 1 KB
    constant; the gather is negligible next to the MLP work it feeds.
    Works on numpy and jax arrays, inside or outside jit.
    """
    if hasattr(a, "dtype") and a.dtype == np.uint8:
        if isinstance(a, np.ndarray):
            return _U8_DECODE_TABLE[a]
        import jax.numpy as jnp

        return jnp.asarray(_U8_DECODE_TABLE)[a.astype(jnp.int32)]
    return a


class DeviceCachedLoader:
    """Device-resident dataset cache: batches become on-device gathers.

    NeRF datasets are small (lego: 100 x 800x800x3 f32 = 768 MB) while the
    training loop touches one image per step — uploading it host->device
    every iteration wastes PCIe/ICI bandwidth and serializes the step. This
    wrapper loads + stacks the whole dataset ONCE, commits it to device, and
    yields per-batch views via device-side indexing (a cheap gather), so the
    steady-state loop does zero host transfers.

    ``quantize_images=True`` additionally stores float32 image fields as
    ``uint8`` when that is PROVABLY lossless (every value an exact multiple
    of 1/255 — true for anything the 8-bit PNG loaders produced), quartering
    both HBM footprint and the one-time upload through the host link; the
    gather sites decode via :func:`decode_cached_field`, which is bit-exact.

    Falls back transparently (acts like the wrapped loader) when the
    estimated cache size exceeds ``max_bytes``.
    """

    def __init__(self, loader: DataLoader, max_bytes: int = 4 << 30, quantize_images: bool = False):
        self.inner = loader
        self.dataset = loader.dataset
        self.sampler = loader.sampler
        self.batch_size = loader.batch_size
        self.drop_last = loader.drop_last
        self.max_bytes = max_bytes
        self.quantize_images = quantize_images
        self._arrays = None
        self._fits = None

    def _maybe_quantize(self, f):
        """f32 -> u8 only when exactly invertible (values are k/255)."""
        if (
            self.quantize_images
            and isinstance(f, np.ndarray)
            and f.dtype == np.float32
            and f.ndim >= 3  # image-shaped; poses/focals stay f32
            # range gate: float->uint8 casts of negative/out-of-range values
            # are undefined behavior in numpy (RuntimeWarnings on >=2.0), and
            # obviously-non-image fields skip the round-trip compare entirely
            and f.size > 0
            and float(f.min()) >= 0.0
            and float(f.max()) <= 1.0
        ):
            u8 = np.round(f * 255.0).astype(np.uint8)
            if np.array_equal(u8.astype(np.float32) / 255.0, f):
                return u8
        return f

    @property
    def data_wrapper(self):
        return self.inner.data_wrapper

    def __len__(self):
        return len(self.inner)

    def _ensure_cache(self) -> bool:
        if self._fits is not None:
            return self._fits
        # a custom collate_fn defines its own batch structure; caching
        # hard-codes stack_batch semantics, so fall back transparently
        # rather than silently yielding a different batch format
        if self.inner.collate_fn is not stack_batch:
            self._fits = False
            return False
        # estimate from the ACTUAL quantization outcome on a probe item: a
        # field whose k/255 exactness check fails stays f32, so assuming a
        # blanket 4x shrink could blow past max_bytes/HBM (ADVICE r3)
        probe = self.dataset[0]
        item_bytes = 0
        for f in probe:
            if not isinstance(f, np.ndarray):
                continue
            item_bytes += self._maybe_quantize(f).nbytes
        if item_bytes * len(self.dataset) > self.max_bytes:
            self._fits = False
            return False
        import jax

        items = [self.dataset[i] for i in range(len(self.dataset))]
        n_fields = len(items[0])
        stacked = []
        for fi in range(n_fields):
            vals = [it[fi] for it in items]
            if isinstance(vals[0], np.ndarray):
                # quantize PER ITEM before stacking: the whole-dataset
                # round-trip compare made ~3 dataset-sized f32 temporaries;
                # per-item bounds the transient to one item, and the stack
                # is u8-sized when every item quantized
                q = [self._maybe_quantize(v) for v in vals]
                if not all(a.dtype == q[0].dtype for a in q):
                    q = vals  # mixed outcome: keep the lossless f32 field
                stacked.append(np.stack(q, axis=0))
            else:
                # non-array fields keep PER-ITEM values; __iter__ applies
                # stack_batch's semantics per chunk (a dataset-wide
                # stack_batch would e.g. turn a per-item float into one
                # global mean served for every batch)
                stacked.append(("itemlist", vals))
        # re-check the real post-quantization total (items can differ from
        # the probe) before committing device memory
        total = sum(f.nbytes for f in stacked if isinstance(f, np.ndarray))
        if total > self.max_bytes:
            self._fits = False
            return False
        self._arrays = tuple(
            jax.device_put(f) if isinstance(f, np.ndarray) else f for f in stacked
        )
        self._fits = True
        return True

    def __iter__(self):
        if not self._ensure_cache():
            yield from self.inner
            return
        import jax.numpy as jnp

        if self.sampler is not None:
            indices = self.sampler.indices()
        else:
            indices = np.arange(len(self.dataset))
            if self.inner.is_train:
                # match the wrapped loader: training epochs reshuffle
                indices = np.random.permutation(indices)
        for start in range(0, len(indices), self.batch_size):
            chunk = indices[start : start + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                continue
            idx = jnp.asarray(chunk)
            out = []
            for f in self._arrays:
                if isinstance(f, tuple) and len(f) == 2 and f[0] == "itemlist":
                    vals = f[1]
                    out.append(stack_batch([(vals[int(i)],) for i in chunk])[0])
                else:
                    out.append(decode_cached_field(f[idx]))
            yield tuple(out)
