"""MetricsLogger: scalar/image dispatch, JSONL persistence, debug-disable
(reference TensorboardLogger semantics, trainers/utils.py:101-151)."""

import json
import os

import numpy as np

from tedm_tpu.utils.logging import MetricsLogger, tile_grid
from tedm_tpu.utils.profiling import StepTimer


def test_scalars_and_images(tmp_path):
    lg = MetricsLogger(str(tmp_path), enabled=True)
    lg.log({"train/loss": 0.5, "lr": np.float32(1e-4)}, 10)
    lg.log({"samples": np.random.rand(4, 8, 8, 1).astype(np.float32)}, 10)
    lg.close()
    with open(tmp_path / "metrics.jsonl") as f:
        recs = [json.loads(l) for l in f]
    assert recs[0]["train/loss"] == 0.5 and recs[0]["step"] == 10
    pngs = os.listdir(tmp_path / "images")
    assert any(p.endswith(".png") for p in pngs)


def test_disabled_logger_writes_nothing(tmp_path):
    lg = MetricsLogger(str(tmp_path / "off"), enabled=False)
    lg.log({"x": 1.0}, 0)
    lg.close()
    assert not os.path.exists(tmp_path / "off" / "metrics.jsonl")


def test_tile_grid_shape():
    g = tile_grid(np.zeros((5, 8, 8, 1), np.float32), ncols=3, pad=1)
    assert g.shape == (2 * 9 + 1, 3 * 9 + 1, 1)


def test_step_timer():
    t = StepTimer()
    for _ in range(5):
        t.tick()
    s = t.stats(batch_size=4)
    assert set(s) == {"perf/step_ms_p50", "perf/step_ms_p95", "perf/imgs_per_sec"}
    t.reset()
    assert t.stats() == {}
