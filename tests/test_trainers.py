"""End-to-end trainer integration at toy size (debug mode = the reference's
de-facto pipeline smoke test, SURVEY §4): baseline, img_only backbone with
best-val checkpoint, then TEDM consuming that checkpoint."""

import json
import os

import pytest

from tedm_tpu.train import main as train_main

ARGS = [
    "--synthetic_data", "--dim", "8", "--dim_mults", "1", "2",
    "--img_size", "32", "--batch_size", "4", "--timesteps", "20",
    "--val_steps", "5", "--n_sampled_imgs", "2", "--num_workers", "1",
]


def test_baseline_debug(tmp_path):
    train_main(["--experiment", "baseline", "--debug", "--n_labelled_images", "3",
                "--log_dir", str(tmp_path / "run")] + ARGS)


def test_backbone_then_tedm(tmp_path):
    logdir = tmp_path / "bb"
    train_main([
        "--experiment", "img_only", "--log_dir", str(logdir),
        "--max_steps", "2", "--val_freq", "2", "--log_freq", "2",
        "--max_val_steps", "1",
    ] + ARGS)
    bb_dir = str(tmp_path / "CXR14" / "bb")
    best = os.path.join(bb_dir, "best")
    assert os.path.isdir(os.path.join(best, "state"))
    # metrics written
    with open(os.path.join(bb_dir, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    assert any("train/loss" in r for r in recs)
    assert any("val/loss" in r for r in recs)

    train_main([
        "--experiment", "TEDM", "--debug", "--n_labelled_images", "3",
        "--log_dir", str(tmp_path / "tedm"),
        "--saved_diffusion_model", best,
    ] + ARGS)


def test_ledm_debug_fresh_backbone(tmp_path):
    train_main([
        "--experiment", "LEDM", "--debug", "--n_labelled_images", "1",
        "--log_dir", str(tmp_path / "ledm"),
        "--saved_diffusion_model", str(tmp_path / "missing"),
    ] + ARGS)


def test_unknown_experiment_raises(tmp_path):
    with pytest.raises(SystemExit):
        train_main(["--experiment", "nope"])


def test_ckpt_every_independent_of_val_freq(tmp_path):
    """Regression: periodic checkpoints were nested under the val_freq
    check, silently skipping any ckpt_every not aligned with validation."""
    import os

    from tedm_tpu.train import main as train_main

    train_main([
        "--experiment", "baseline", "--n_labelled_images", "3",
        "--log_dir", str(tmp_path / "b"), "--max_steps", "6",
        "--val_freq", "4", "--log_freq", "4", "--ckpt_every", "3",
    ] + ARGS)
    run = tmp_path / "baseline" / "3" / "b"
    # steps 3 and 6 are NOT validation boundaries (val at 4) but must save
    assert os.path.isdir(run / "step_3" / "state")
    assert os.path.isdir(run / "step_6" / "state")
