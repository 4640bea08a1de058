"""Batch loader: static shapes, seeded shuffling, prefetch, host sharding.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=4,
pin_memory=True)`` (dataloaders/JSRT.py:36-44) with a TPU-fed design:

* **Static batch shapes.** Ragged final batches force XLA recompiles; here
  every batch has the same shape and carries a ``valid`` mask (1.0 for real
  rows, 0.0 for padding). Metrics and losses are mask-aware.
* **Per-host sharding.** On a multi-host mesh each process loads only its
  1/num_shards slice of every epoch (SURVEY §2.3: per-host sharded data
  loading over DCN).
* **Seeded epoch shuffling.** Permutation is a pure function of
  (seed, epoch) — identical across hosts, so shards never overlap.
* **Thread-pool prefetch.** PIL decode/resize runs in ``num_workers``
  threads while the device computes; a bounded queue holds ready batches.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, Optional

import numpy as np


class Loader:
    def __init__(
        self,
        dataset: Any,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        shard_index: int = 0,
        shard_count: int = 1,
        num_workers: int = 4,
        prefetch: int = 2,
        subset: Optional[int] = None,
    ):
        self.dataset = dataset
        self.has_labels = getattr(dataset, "has_labels", True)
        n = len(dataset) if subset is None else min(subset, len(dataset))
        self.indices = np.arange(n)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.shard_index = shard_index
        self.shard_count = shard_count
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.epoch = 0

        # Shard-INVARIANT batch size and per-epoch batch count: in a
        # multi-host run every process must compile the same shapes and
        # step the same number of batches per epoch (strided shard sizes
        # differ by one, which would otherwise desync the SPMD program).
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
                # Clamp rather than hang: batch_size > the smallest shard
                # would drop every batch (repeat() busy-loops on 0-batch
                # epochs). Shard-invariant, so every host clamps identically.
                print(
                    f"[pipeline] drop_last: clamping batch_size "
                    f"{self.batch_size} -> {min_shard} (smallest host shard)"
                )
                self.batch_size = min_shard
            self._epoch_batches = min_shard // self.batch_size
        else:
            self._epoch_batches = (max_shard + self.batch_size - 1) // self.batch_size

    def _shard_indices(self, epoch: int) -> np.ndarray:
        idx = self.indices
        if self.shuffle:
            rng = np.random.RandomState(self.seed + epoch)
            idx = rng.permutation(idx)
        # Contiguous stride sharding; identical permutation on every host.
        return idx[self.shard_index :: self.shard_count]

    def __len__(self) -> int:
        return self._epoch_batches

    def _item_shapes(self):
        """Shapes for fully-padded batches (only needed when this host's
        shard runs out before the epoch's shard-invariant batch count)."""
        it = self.dataset[0]
        if self.has_labels:
            return it[0].shape, it[1].shape
        return it.shape, None

    def _make_batch(self, idxs: np.ndarray, pool: ThreadPoolExecutor) -> Dict[str, np.ndarray]:
        bs = self.batch_size
        valid = np.zeros((bs,), np.float32)
        valid[: len(idxs)] = 1.0
        if len(idxs) == 0:  # lockstep filler for a shorter shard
            img_s, mask_s = self._item_shapes()
            out = {"image": np.zeros((bs, *img_s), np.float32), "valid": valid}
            if mask_s is not None:
                out["mask"] = np.zeros((bs, *mask_s), np.float32)
            return out
        # Whole-batch fast path (unlabeled image datasets): one native C++
        # call decodes+resizes the batch across std::threads, no GIL.
        if not self.has_labels and hasattr(self.dataset, "get_batch"):
            imgs = np.asarray(self.dataset.get_batch(list(idxs)))
            if len(idxs) < bs:
                pad = bs - len(idxs)
                imgs = np.concatenate([imgs, np.zeros((pad, *imgs.shape[1:]), imgs.dtype)])
            return {"image": imgs, "valid": valid}
        items = list(pool.map(self.dataset.__getitem__, idxs))
        if self.has_labels:
            imgs = np.stack([it[0] for it in items])
            masks = np.stack([it[1] for it in items])
            if len(items) < bs:
                pad = bs - len(items)
                imgs = np.concatenate([imgs, np.zeros((pad, *imgs.shape[1:]), imgs.dtype)])
                masks = np.concatenate([masks, np.zeros((pad, *masks.shape[1:]), masks.dtype)])
            return {"image": imgs, "mask": masks, "valid": valid}
        imgs = np.stack(items)
        if len(items) < bs:
            pad = bs - len(items)
            imgs = np.concatenate([imgs, np.zeros((pad, *imgs.shape[1:]), imgs.dtype)])
        return {"image": imgs, "valid": valid}

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._shard_indices(self.epoch)
        self.epoch += 1
        batches = [
            idx[i : i + self.batch_size] for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        # Every host emits exactly _epoch_batches batches (shard-invariant):
        # truncate or pad with empty index lists (yielding valid=0 filler)
        # so multi-host SPMD stays in lockstep on uneven shards.
        batches = batches[: self._epoch_batches]
        while len(batches) < self._epoch_batches:
            batches.append(np.array([], dtype=np.int64))

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        DONE, ERROR = "__done__", "__error__"

        def _put(item) -> bool:
            """Bounded put that aborts when the consumer is gone (an early
            ``break`` in the consumer must not leak a blocked producer)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in batches:
                        if not _put((None, self._make_batch(b, pool))):
                            return
                _put((DONE, None))
            except BaseException as e:  # surface dataset errors, never hang
                _put((ERROR, e))

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                kind, item = q.get()
                if kind == DONE:
                    break
                if kind == ERROR:
                    raise item
                yield item
        finally:
            stop.set()

    def repeat(self) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite epoch stream (the reference's outer ``while True`` epoch
        loop, trainers/train_baseline.py:24-96)."""
        while True:
            yield from self


def build_dataloaders(
    dataset: str,
    data_dir: Optional[str],
    img_size: int = 128,
    batch_size: int = 16,
    num_workers: int = 4,
    n_labelled_images: Optional[int] = None,
    seed: int = 0,
    shard_index: int = 0,
    shard_count: int = 1,
    synthetic: bool = False,
    backend: str = "threads",
    drop_last: bool = False,
    splits_dir: Optional[str] = None,
) -> Dict[str, Loader]:
    """The reference's per-dataset ``build_dataloaders`` surface
    (dataloaders/JSRT.py:17-46, dataloaders/CXR14.py:21-45) behind one
    dispatcher. Train is shuffled + host-sharded; val/test are neither.
    ``synthetic=True`` (or data_dir=None) swaps in the deterministic
    generator with the same split sizes. ``backend='grain'`` uses the
    grain-based loader (same batch contract)."""
    from tedm_tpu.data.datasets import (
        SPLITS_DIR,
        CXR14Dataset,
        JSRTDataset,
        SyntheticCXRDataset,
    )

    sdir = splits_dir or SPLITS_DIR

    if backend == "grain":
        from tedm_tpu.data.grain_pipeline import GrainLoader as LoaderCls

        extra = {}
    else:
        LoaderCls, extra = Loader, {"num_workers": num_workers}

    synthetic = synthetic or data_dir is None

    if backend == "device":
        # Accelerator-side synthetic generation: host ships only index
        # batches (tedm_tpu/data/device_synthetic.py). Synthetic-only.
        if not synthetic:
            raise ValueError("backend='device' requires synthetic data")
        from tedm_tpu.data.device_synthetic import DeviceSyntheticLoader

        mkd = lambda split, n, labelled, shuffle, shard, subset=None: (
            DeviceSyntheticLoader(
                split, n, img_size, batch_size, labelled=labelled, seed=seed,
                shuffle=shuffle,
                shard_index=shard_index if shard else 0,
                shard_count=shard_count if shard else 1,
                subset=subset, drop_last=drop_last,
            )
        )
        if dataset == "JSRT":
            return {
                "train": mkd("train", 197, True, True, True, n_labelled_images),
                "val": mkd("val", 25, True, False, False),
                "test": mkd("test", 25, True, False, False),
            }
        if dataset == "CXR14":
            return {
                "train": mkd("cxr_train", 2048, False, True, True),
                "val": mkd("cxr_train", 2048, False, False, False),
                "test": mkd("cxr_train", 2048, False, False, False),
            }
        raise ValueError(f"unknown dataset {dataset}")
    mk = lambda ds, shuffle, shard, subset=None: LoaderCls(
        ds,
        batch_size,
        shuffle=shuffle,
        seed=seed,
        shard_index=shard_index if shard else 0,
        shard_count=shard_count if shard else 1,
        subset=subset,
        drop_last=drop_last,
        **extra,
    )

    if dataset == "JSRT":
        if synthetic:
            train = SyntheticCXRDataset("train", 197, img_size, labelled=True, seed=seed)
            val = SyntheticCXRDataset("val", 25, img_size, labelled=True, seed=seed)
            test = SyntheticCXRDataset("test", 25, img_size, labelled=True, seed=seed)
        else:
            train = JSRTDataset(data_dir, "JSRT_train_split.csv", img_size, splits_dir=sdir)
            val = JSRTDataset(data_dir, "JSRT_val_split.csv", img_size, splits_dir=sdir)
            test = JSRTDataset(data_dir, "JSRT_test_split.csv", img_size, splits_dir=sdir)
        # Semi-supervised subset = first N rows (reference: JSRT.py:29-31).
        return {
            "train": mk(train, True, True, subset=n_labelled_images),
            "val": mk(val, False, False),
            "test": mk(test, False, False),
        }

    if dataset == "CXR14":
        if synthetic:
            train = SyntheticCXRDataset("cxr_train", 2048, img_size, labelled=False, seed=seed)
            val = SyntheticCXRDataset("cxr_train", 2048, img_size, labelled=False, seed=seed)
        else:
            train = CXR14Dataset(data_dir, "train_split.csv", img_size, splits_dir=sdir)
            # Parity quirk: the reference points val/test at train_split.csv
            # too (dataloaders/CXR14.py:30-32).
            val = CXR14Dataset(data_dir, "train_split.csv", img_size, splits_dir=sdir)
        return {
            "train": mk(train, True, True),
            "val": mk(val, False, False),
            "test": mk(val, False, False),
        }

    raise ValueError(f"unknown dataset {dataset}")
