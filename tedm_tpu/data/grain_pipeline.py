"""Optional grain-backed input pipeline.

SURVEY §2.3 names grain/tf.data as the production per-host sharded
loading path. The default thread-pool ``Loader`` already implements the
framework's batch contract (static shapes + valid masks, seeded epoch
shuffling, host sharding); this module provides the same contract on top
of ``grain.MapDataset`` for deployments that want grain's worker
threads, determinism guarantees, and checkpointable iterators. It is
reachable from every trainer via ``--data_backend grain``.

    loader = GrainLoader(dataset, batch_size=16, shuffle=True, seed=0,
                         shard_index=jax.process_index(),
                         shard_count=jax.process_count())
    for batch in loader:          # {"image", ("mask",) "valid"}
        ...

Any dataset from tedm_tpu.data.datasets works (random-access __len__ /
__getitem__ sources).

Multi-host lockstep contract (identical to ``pipeline.Loader``): every
host emits the SAME batch size and the SAME number of batches per epoch,
regardless of how unevenly the strided shard divides — short shards are
padded with valid=0 filler batches (or truncated under ``drop_last``).
Anything weaker desyncs the SPMD program: one host would enter step N+1's
collective while another has already left the loop.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, Optional

import numpy as np


class _Source:
    """grain RandomAccessDataSource over our dataset objects."""

    def __init__(self, dataset):
        self._ds = dataset

    def __len__(self) -> int:
        return len(self._ds)

    def __getitem__(self, i: int):
        return self._ds[int(i)]


class GrainLoader:
    """Same interface/batch contract as tedm_tpu.data.pipeline.Loader."""

    def __init__(
        self,
        dataset: Any,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        shard_index: int = 0,
        shard_count: int = 1,
        num_workers: int = 0,
        subset: Optional[int] = None,
        drop_last: bool = False,
    ):
        self.dataset = dataset
        self.has_labels = getattr(dataset, "has_labels", True)
        n = len(dataset) if subset is None else min(subset, len(dataset))
        self.indices = np.arange(n)  # Loader-contract attribute
        self._n = n
        self._shuffle = shuffle
        self._seed = seed
        self._shard = (shard_index, shard_count)
        self._num_workers = num_workers
        self.drop_last = drop_last
        self.epoch = 0

        # Shard-INVARIANT batch size and per-epoch batch count — the exact
        # semantics of pipeline.Loader.__init__ (see that module's docstring
        # and the lockstep comment above).
        max_shard = (n + shard_count - 1) // shard_count
        min_shard = n // shard_count
        self.batch_size = min(batch_size, max(1, max_shard))
        if drop_last:
            if min_shard == 0:
                raise ValueError(
                    f"drop_last=True with {n} items over {shard_count} shards "
                    "leaves some host with an empty shard: every epoch would "
                    "yield zero batches and repeat() would spin forever."
                )
            if min_shard < self.batch_size:
                print(
                    f"[grain_pipeline] drop_last: clamping batch_size "
                    f"{self.batch_size} -> {min_shard} (smallest host shard)"
                )
                self.batch_size = min_shard
            self._epoch_batches = min_shard // self.batch_size
        else:
            self._epoch_batches = (max_shard + self.batch_size - 1) // self.batch_size

    def _epoch_ds(self, epoch: int):
        """Fresh shuffled view per epoch (Loader contract: the permutation
        is a pure function of (seed, epoch), identical across hosts)."""
        import grain

        ds = grain.MapDataset.source(_Source(self.dataset))[: self._n]
        if self._shuffle:
            ds = ds.shuffle(seed=self._seed + epoch)
        i, c = self._shard
        return ds[i::c]

    def __len__(self) -> int:
        return self._epoch_batches

    def _item_shapes(self):
        it = self.dataset[0]
        if self.has_labels:
            return it[0].shape, it[1].shape
        return it.shape, None

    def _filler_batch(self) -> Dict[str, np.ndarray]:
        """All-padding batch (valid=0 rows) for lockstep on short shards."""
        bs = self.batch_size
        img_s, mask_s = self._item_shapes()
        out = {
            "image": np.zeros((bs, *img_s), np.float32),
            "valid": np.zeros((bs,), np.float32),
        }
        if mask_s is not None:
            out["mask"] = np.zeros((bs, *mask_s), np.float32)
        return out

    def _to_batch(self, items) -> Dict[str, np.ndarray]:
        bs = self.batch_size
        valid = np.zeros((bs,), np.float32)
        valid[: len(items)] = 1.0

        def pad(x):
            if len(x) < bs:
                x = np.concatenate(
                    [x, np.zeros((bs - len(x), *x.shape[1:]), x.dtype)]
                )
            return x

        if self.has_labels:
            imgs = pad(np.stack([it[0] for it in items]))
            masks = pad(np.stack([it[1] for it in items]))
            return {"image": imgs, "mask": masks, "valid": valid}
        return {"image": pad(np.stack(items)), "valid": valid}

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        import grain

        ds = self._epoch_ds(self.epoch)
        self.epoch += 1
        read_opts = grain.ReadOptions(
            num_threads=max(1, self._num_workers), prefetch_buffer_size=64
        )
        it = iter(ds.to_iter_dataset(read_options=read_opts))
        emitted = 0
        buf = []
        for item in it:
            buf.append(item)
            if len(buf) == self.batch_size:
                if emitted == self._epoch_batches:  # truncate (lockstep)
                    buf = []
                    break
                yield self._to_batch(buf)
                emitted += 1
                buf = []
        if buf and not self.drop_last and emitted < self._epoch_batches:
            yield self._to_batch(buf)
            emitted += 1
        # Pad with valid=0 filler so every host emits _epoch_batches batches.
        while emitted < self._epoch_batches:
            yield self._filler_batch()
            emitted += 1

    def repeat(self) -> Iterator[Dict[str, np.ndarray]]:
        while True:
            yield from self
