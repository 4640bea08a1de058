"""Input pipeline tests: static shapes + valid masks, determinism, host
sharding partition, subset semantics (SURVEY §4 test strategy; reference
behaviors: dataloaders/JSRT.py:29-31 subset, ragged final batch)."""

import numpy as np

from tedm_tpu.data import Loader, SyntheticCXRDataset, build_dataloaders


def test_synthetic_deterministic():
    ds = SyntheticCXRDataset("train", 8, 64)
    img1, mask1 = ds[3]
    img2, mask2 = ds[3]
    np.testing.assert_array_equal(img1, img2)
    np.testing.assert_array_equal(mask1, mask2)
    assert img1.shape == (64, 64, 1) and mask1.shape == (64, 64, 1)
    assert set(np.unique(mask1)) <= {0.0, 1.0}
    assert img1.min() >= 0.0 and img1.max() <= 1.0
    # distinct indices and splits give distinct images
    assert not np.array_equal(ds[3][0], ds[4][0])
    assert not np.array_equal(
        SyntheticCXRDataset("val", 8, 64)[3][0], img1
    )


def test_static_shapes_and_valid_mask():
    ds = SyntheticCXRDataset("train", 10, 32)
    loader = Loader(ds, batch_size=4, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b["image"].shape == (4, 32, 32, 1)
        assert b["mask"].shape == (4, 32, 32, 1)
    assert batches[-1]["valid"].tolist() == [1.0, 1.0, 0.0, 0.0]
    assert np.all(batches[-1]["image"][2:] == 0)


def test_shuffle_seeded_and_epochs_differ():
    ds = SyntheticCXRDataset("train", 16, 16)
    l1 = Loader(ds, batch_size=16, shuffle=True, seed=7)
    l2 = Loader(ds, batch_size=16, shuffle=True, seed=7)
    b1, b2 = next(iter(l1)), next(iter(l2))
    np.testing.assert_array_equal(b1["image"], b2["image"])
    b1b = next(iter(l1))  # epoch 2
    assert not np.array_equal(b1["image"], b1b["image"])


def test_host_sharding_partitions_epoch():
    ds = SyntheticCXRDataset("train", 12, 16)
    shards = [
        Loader(ds, batch_size=3, shuffle=True, seed=1, shard_index=i, shard_count=3)
        for i in range(3)
    ]
    seen = []
    for s in shards:
        for b in s:
            seen.extend(b["image"][b["valid"] > 0].reshape(len(b["image"][b["valid"] > 0]), -1).sum(1).tolist())
    assert len(seen) == 12
    assert len(set(np.round(seen, 5))) == 12  # disjoint coverage


def test_small_dataset_batch_clamps():
    ds = SyntheticCXRDataset("train", 1, 16)
    loader = Loader(ds, batch_size=16)
    (b,) = list(loader)
    assert b["image"].shape[0] == 1  # n_labelled=1 trains at batch 1 (parity)


def test_build_dataloaders_synthetic_jsrt():
    dls = build_dataloaders("JSRT", None, img_size=32, batch_size=8,
                            n_labelled_images=3, num_workers=1)
    tb = next(iter(dls["train"]))
    assert tb["image"].shape[0] == 3
    assert sum(int(b["valid"].sum()) for b in dls["val"]) == 25
    assert sum(int(b["valid"].sum()) for b in dls["test"]) == 25


def test_loader_order_deterministic_with_workers():
    """The thread pool must not introduce batch-order or content races
    (single producer; pool.map preserves item order)."""
    ds = SyntheticCXRDataset("train", 20, 16)
    a = [b["image"] for b in Loader(ds, batch_size=4, num_workers=4)]
    b = [b["image"] for b in Loader(ds, batch_size=4, num_workers=1)]
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_loader_propagates_dataset_errors():
    """A dataset error must raise in the consumer, not hang the queue."""

    class Broken:
        has_labels = False

        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i == 2:
                raise OSError("corrupt image")
            return np.zeros((8, 8, 1), np.float32)

    loader = Loader(Broken(), batch_size=2, num_workers=1)
    import pytest

    with pytest.raises(OSError, match="corrupt image"):
        list(loader)


def test_loader_early_break_no_deadlock():
    ds = SyntheticCXRDataset("train", 64, 16)
    loader = Loader(ds, batch_size=4, num_workers=2, prefetch=1)
    for _ in range(3):  # break early repeatedly; producer threads must stop
        for i, b in enumerate(loader):
            if i == 1:
                break
    import threading

    # give producers a beat to notice the stop flag
    import time as _t

    _t.sleep(0.5)
    assert threading.active_count() < 20


def test_build_dataloaders_synthetic_cxr14():
    dls = build_dataloaders("CXR14", None, img_size=32, batch_size=64, num_workers=1)
    b = next(iter(dls["train"]))
    assert b["image"].shape == (64, 32, 32, 1)
    assert "mask" not in b


def test_shard_lockstep_uneven():
    """Multi-host SPMD contract: every shard yields the SAME batch size and
    SAME number of batches per epoch, padding the short shard with
    valid=0 filler (uneven shards would otherwise desync the mesh)."""
    ds = SyntheticCXRDataset("train", 25, 16)  # 2 shards: 13 + 12 rows
    a = Loader(ds, batch_size=16, shard_index=0, shard_count=2)
    b = Loader(ds, batch_size=16, shard_index=1, shard_count=2)
    assert a.batch_size == b.batch_size == 13
    ba, bb = list(a), list(b)
    assert len(ba) == len(bb) == len(a) == len(b) == 1
    assert ba[0]["image"].shape == bb[0]["image"].shape
    assert int(ba[0]["valid"].sum()) == 13 and int(bb[0]["valid"].sum()) == 12

    # smaller batches: shard 0 has 2 batches of 8 (13 rows), shard 1 only
    # 12 rows -> same count, second batch partially padded
    a = Loader(ds, batch_size=8, shard_index=0, shard_count=2)
    b = Loader(ds, batch_size=8, shard_index=1, shard_count=2)
    ba, bb = list(a), list(b)
    assert len(ba) == len(bb) == 2
    assert int(sum(x["valid"].sum() for x in ba)) == 13
    assert int(sum(x["valid"].sum() for x in bb)) == 12

    # drop_last: both shards emit exactly min_shard // bs full batches
    a = Loader(ds, batch_size=8, shard_index=0, shard_count=2, drop_last=True)
    b = Loader(ds, batch_size=8, shard_index=1, shard_count=2, drop_last=True)
    ba, bb = list(a), list(b)
    assert len(ba) == len(bb) == 1
    assert all(int(x["valid"].sum()) == 8 for x in ba + bb)


def test_drop_last_no_padded_rows():
    """CL loaders use drop_last so contrastive losses never see all-zero
    padding rows as fake images."""
    ds = SyntheticCXRDataset("train", 10, 16, labelled=False)
    loader = Loader(ds, batch_size=4, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    for b in batches:
        assert (b["valid"] == 1.0).all()


def test_drop_last_small_shard_clamps():
    """batch_size > smallest shard with drop_last clamps (identically on
    every host) instead of yielding 0-batch epochs that spin repeat()."""
    ds = SyntheticCXRDataset("train", 10, 16)
    loader = Loader(ds, batch_size=16, drop_last=True)
    batches = list(loader)
    assert loader.batch_size == 10
    assert len(batches) == 1 and (batches[0]["valid"] == 1.0).all()

    # sharded: min_shard=5 bounds the clamp on BOTH hosts
    a = Loader(ds, batch_size=16, drop_last=True, shard_index=0, shard_count=2)
    b = Loader(ds, batch_size=16, drop_last=True, shard_index=1, shard_count=2)
    assert a.batch_size == b.batch_size == 5
    assert len(list(a)) == len(list(b)) == 1


def test_drop_last_empty_shard_raises():
    import pytest

    ds = SyntheticCXRDataset("train", 3, 16)
    with pytest.raises(ValueError, match="empty shard"):
        Loader(ds, batch_size=4, drop_last=True, shard_index=0, shard_count=4)


def test_device_synthetic_loader_contract():
    """backend='device': same Loader contract (static shapes, valid mask,
    lockstep count, determinism) with batches rendered on-accelerator."""
    dls = build_dataloaders("JSRT", None, img_size=16, batch_size=4,
                            n_labelled_images=3, backend="device", seed=1)
    b = next(iter(dls["train"]))
    assert b["image"].shape == (3, 16, 16, 1)
    assert b["mask"].shape == (3, 16, 16, 1)
    assert float(b["image"].min()) >= 0.0 and float(b["image"].max()) <= 1.0
    assert set(np.unique(np.asarray(b["mask"]))) <= {0.0, 1.0}
    # deterministic given (split, seed, index)
    dls2 = build_dataloaders("JSRT", None, img_size=16, batch_size=4,
                             n_labelled_images=3, backend="device", seed=1)
    b2 = next(iter(dls2["train"]))
    np.testing.assert_array_equal(np.asarray(b["image"]), np.asarray(b2["image"]))
    # val split differs from train split
    v = next(iter(dls["val"]))
    assert not np.array_equal(np.asarray(v["image"][:3]), np.asarray(b["image"]))
    assert sum(int(x["valid"].sum()) for x in dls["val"]) == 25

    # lockstep contract on uneven shards
    from tedm_tpu.data.device_synthetic import DeviceSyntheticLoader
    a = DeviceSyntheticLoader("train", 25, 16, 8, shard_index=0, shard_count=2)
    c = DeviceSyntheticLoader("train", 25, 16, 8, shard_index=1, shard_count=2)
    la, lc = list(a), list(c)
    assert len(la) == len(lc) == 2
    assert int(sum(x["valid"].sum() for x in la)) == 13
    assert int(sum(x["valid"].sum() for x in lc)) == 12


def test_synthetic_hard_corpus():
    """HARD variant (VERDICT r3 #2): deterministic, valid ranges, midline-
    disjoint lungs (the parity exporter's per-lung column partition), and
    measurably harder than the easy corpus by intensity separability."""
    ds = SyntheticCXRDataset("train", 8, 64, hard=True)
    img1, mask1 = ds[3]
    img2, mask2 = ds[3]
    np.testing.assert_array_equal(img1, img2)
    np.testing.assert_array_equal(mask1, mask2)
    assert img1.shape == (64, 64, 1) and set(np.unique(mask1)) <= {0.0, 1.0}
    assert img1.min() >= 0.0 and img1.max() <= 1.0
    # the hard flag actually changes pixels; the easy path is untouched
    easy = SyntheticCXRDataset("train", 8, 64)[3][0]
    assert not np.array_equal(img1, easy)

    def oracle_threshold_dice(ds, n=6):
        best = []
        for i in range(n):
            img, m = ds[i]
            cands = np.linspace(0.05, 0.95, 46)
            scores = [
                2 * ((img < c) * m).sum() / (max((img < c).sum() + m.sum(), 1))
                for c in cands
            ]
            best.append(max(scores))
        return float(np.mean(best))

    hard_sep = oracle_threshold_dice(SyntheticCXRDataset("train", 8, 64, hard=True))
    easy_sep = oracle_threshold_dice(SyntheticCXRDataset("train", 8, 64))
    assert hard_sep < easy_sep - 0.15, (hard_sep, easy_sep)

    # midline partition: no lung pixel crosses x = 0.5 into the wrong half
    for i in range(6):
        _, m = ds[i]
        s = m.shape[0]
        xx = np.arange(s)[None, :, None] / s
        left = m * (xx < 0.5)
        right = m * (xx >= 0.5)
        np.testing.assert_array_equal(np.maximum(left, right), m)
        assert left.sum() > 0 and right.sum() > 0
