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
