"""Serving layer: cached Predictor over the logs tree, grid composer,
postprocess (reference: app.py predict_* + postprocess + grid)."""

import numpy as np
import pytest

from tedm_tpu.train import main as train_main

ARGS = [
    "--synthetic_data", "--dim", "8", "--dim_mults", "1", "2",
    "--img_size", "16", "--batch_size", "2", "--timesteps", "8",
    "--num_workers", "1", "--max_val_steps", "1",
]


@pytest.fixture(scope="module")
def logs_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve_logs")
    train_main([
        "--experiment", "baseline", "--n_labelled_images", "3",
        "--log_dir", str(root / "run"), "--max_steps", "2",
        "--val_freq", "2", "--log_freq", "2",
    ] + ARGS)
    return str(root)


def test_predict_grid_and_postprocess(logs_root):
    from tedm_tpu.serve.app import Predictor, predict

    pred = Predictor(logs_root)
    img = np.random.rand(40, 40).astype(np.float32)
    grid = predict(img, ["Baseline"], [3], seg_img=True, predictor=pred)
    assert grid.ndim == 3 and grid.shape[-1] == 3
    assert grid.min() >= 0.0 and grid.max() <= 1.0
    binary = predict(img, ["Baseline"], [3], seg_img=False, predictor=pred)
    assert binary.shape == grid.shape
    # second call hits the checkpoint cache (same object identity)
    assert len(pred._cache) == 1


def test_load_img_variants():
    from PIL import Image

    from tedm_tpu.serve.app import load_img

    a = load_img(np.random.rand(50, 60).astype(np.float32), 16)
    assert a.shape == (1, 16, 16, 1)
    b = load_img(Image.fromarray((np.random.rand(30, 30) * 255).astype(np.uint8)), 16)
    assert b.shape == (1, 16, 16, 1)
    with pytest.raises(TypeError):
        load_img(123)


def test_postprocess_keeps_two_components():
    from tedm_tpu.serve.app import postprocess

    pred = np.zeros((32, 32), np.float32)
    pred[2:6, 2:6] = 1     # big
    pred[20:26, 20:26] = 1  # bigger
    pred[10, 10] = 1        # speck (should be dropped)
    img = np.full((32, 32), 0.5, np.float32)
    rgb = postprocess(pred, img)
    assert rgb.shape == (32, 32, 3)
    red = (rgb[..., 0] == 1.0) & (rgb[..., 1] == 0.0)
    assert red.any()
    assert not red[9:12, 9:12].any()  # speck boundary not drawn
