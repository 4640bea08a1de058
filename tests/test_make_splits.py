"""Split generation (reference: auxiliary/preprocessing/*.py — 80/10/10
shuffled CSV writers; here seeded and therefore reproducible)."""

import os

import numpy as np
import pandas as pd

from tedm_tpu.data.make_splits import main, write_splits


def test_write_splits_partition(tmp_path):
    df = pd.DataFrame({"path": [f"im{i}.png" for i in range(50)],
                       "id": [f"c{i}" for i in range(50)]})
    write_splits(df, str(tmp_path), "JSRT_", seed=0)
    parts = {
        name: pd.read_csv(tmp_path / f"JSRT_{name}_split.csv")
        for name in ("train", "val", "test")
    }
    assert len(parts["train"]) == 40 and len(parts["val"]) == 5 and len(parts["test"]) == 5
    # disjoint and exhaustive
    all_rows = pd.concat(parts.values())
    assert sorted(all_rows["path"]) == sorted(df["path"])
    assert all_rows["path"].is_unique
    # seeded -> deterministic
    write_splits(df, str(tmp_path / "again"), "JSRT_", seed=0)
    again = pd.read_csv(tmp_path / "again" / "JSRT_train_split.csv")
    assert list(again["path"]) == list(parts["train"]["path"])


def test_cli_jsrt(tmp_path):
    src = tmp_path / "raw"
    os.makedirs(src)
    pd.DataFrame({"path": [f"im{i}.png" for i in range(20)],
                  "id": [f"c{i}" for i in range(20)]}).to_csv(
        src / "jsrt_metadata_with_masks.csv", index=False)
    out = tmp_path / "out"
    main(["jsrt", "--data_dir", str(src), "--out", str(out), "--seed", "1"])
    assert len(pd.read_csv(out / "JSRT_train_split.csv")) == 16
    assert len(pd.read_csv(out / "JSRT_val_split.csv")) == 2
    assert len(pd.read_csv(out / "JSRT_test_split.csv")) == 2
