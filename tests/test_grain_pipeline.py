"""GrainLoader honors the same batch contract as Loader (SURVEY §2.3:
grain as the production per-host sharded loading option)."""

import numpy as np
import pytest

pytest.importorskip("grain")

from tedm_tpu.data.datasets import SyntheticCXRDataset
from tedm_tpu.data.grain_pipeline import GrainLoader


def test_batches_and_valid_mask():
    ds = SyntheticCXRDataset("train", 10, 16)
    loader = GrainLoader(ds, batch_size=4)
    batches = list(loader)
    assert len(batches) == 3 == len(loader)
    for b in batches:
        assert b["image"].shape == (4, 16, 16, 1)
    assert batches[-1]["valid"].tolist() == [1.0, 1.0, 0.0, 0.0]


def test_shuffle_seeded():
    ds = SyntheticCXRDataset("train", 16, 8)
    a = next(iter(GrainLoader(ds, 16, shuffle=True, seed=5)))
    b = next(iter(GrainLoader(ds, 16, shuffle=True, seed=5)))
    np.testing.assert_array_equal(a["image"], b["image"])
    c = next(iter(GrainLoader(ds, 16, shuffle=True, seed=6)))
    assert not np.array_equal(a["image"], c["image"])


def test_host_sharding_disjoint():
    ds = SyntheticCXRDataset("train", 12, 8)
    seen = []
    for i in range(3):
        for b in GrainLoader(ds, 4, shuffle=True, seed=1, shard_index=i, shard_count=3):
            rows = b["image"][b["valid"] > 0]
            seen.extend(rows.reshape(len(rows), -1).sum(1).tolist())
    assert len(seen) == 12
    assert len(set(np.round(seen, 5))) == 12


def test_image_only_dataset():
    ds = SyntheticCXRDataset("u", 6, 8, labelled=False)
    (b1, b2) = list(GrainLoader(ds, 3))
    assert "mask" not in b1 and b1["image"].shape == (3, 8, 8, 1)


def test_shard_lockstep_uneven():
    """GrainLoader mirrors Loader's multi-host lockstep contract: identical
    batch size AND per-epoch batch count on every shard, with valid=0
    filler on the short shard (VERDICT r1 weak #2)."""
    ds = SyntheticCXRDataset("train", 25, 16)  # shards: 13 + 12 rows
    a = GrainLoader(ds, batch_size=16, shard_index=0, shard_count=2)
    b = GrainLoader(ds, batch_size=16, shard_index=1, shard_count=2)
    assert a.batch_size == b.batch_size == 13
    ba, bb = list(a), list(b)
    assert len(ba) == len(bb) == len(a) == len(b) == 1
    assert int(ba[0]["valid"].sum()) == 13 and int(bb[0]["valid"].sum()) == 12

    a = GrainLoader(ds, batch_size=8, shard_index=0, shard_count=2)
    b = GrainLoader(ds, batch_size=8, shard_index=1, shard_count=2)
    ba, bb = list(a), list(b)
    assert len(ba) == len(bb) == 2
    assert int(sum(x["valid"].sum() for x in ba)) == 13
    assert int(sum(x["valid"].sum() for x in bb)) == 12
    assert ba[1]["image"].shape == bb[1]["image"].shape

    # drop_last: both shards truncate to min_shard // bs full batches
    a = GrainLoader(ds, batch_size=8, shard_index=0, shard_count=2, drop_last=True)
    b = GrainLoader(ds, batch_size=8, shard_index=1, shard_count=2, drop_last=True)
    ba, bb = list(a), list(b)
    assert len(ba) == len(bb) == 1
    assert all(int(x["valid"].sum()) == 8 for x in ba + bb)


def test_extreme_uneven_filler_batches():
    """A shard can be short by WHOLE batches (9 rows over 4 shards: 3,2,2,2
    -> with bs=3 shard 0 has 1 full batch, others need filler)."""
    ds = SyntheticCXRDataset("train", 9, 8)
    loaders = [
        GrainLoader(ds, batch_size=3, shard_index=i, shard_count=4)
        for i in range(4)
    ]
    counts = [len(list(l)) for l in loaders]
    assert counts == [1, 1, 1, 1]
    totals = [int(sum(b["valid"].sum() for b in l)) for l in
              (list(GrainLoader(ds, 3, shard_index=i, shard_count=4)) for i in range(4))]
    assert sum(totals) == 9


def test_drop_last_clamp_and_raise():
    ds = SyntheticCXRDataset("train", 10, 8)
    loader = GrainLoader(ds, batch_size=16, drop_last=True)
    assert loader.batch_size == 10
    assert len(list(loader)) == 1
    with pytest.raises(ValueError, match="empty shard"):
        GrainLoader(SyntheticCXRDataset("train", 3, 8), batch_size=4,
                    drop_last=True, shard_index=0, shard_count=4)
