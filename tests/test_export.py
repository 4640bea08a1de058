"""AOT predictor export: serialize a trained experiment's predictor to
StableHLO and call it back without model code (serve/export.py)."""

import numpy as np
import pytest

from tedm_tpu.train import main as train_main

ARGS = [
    "--synthetic_data", "--dim", "8", "--dim_mults", "1", "2",
    "--img_size", "16", "--batch_size", "2", "--timesteps", "8",
    "--num_workers", "1", "--max_val_steps", "1",
]


def test_export_roundtrip(tmp_path):
    train_main([
        "--experiment", "baseline", "--n_labelled_images", "3",
        "--log_dir", str(tmp_path / "run"), "--max_steps", "2",
        "--val_freq", "2", "--log_freq", "2",
    ] + ARGS)
    run = str(tmp_path / "baseline" / "3" / "run")

    from tedm_tpu.eval.harness import load_experiment, make_predict_fn
    from tedm_tpu.serve.export import export_predictor, load_exported

    out = str(tmp_path / "model.bin")
    n = export_predictor(run, out, batch_size=2)
    assert n > 1000

    predict = load_exported(out)
    x = np.random.rand(2, 16, 16, 1).astype(np.float32)
    probs = predict(x)
    assert probs.shape == (2, 16, 16, 1)
    assert (probs >= 0).all() and (probs <= 1).all()

    # must match the live (non-exported) predictor bit-for-bit
    import jax

    config, state, task = load_experiment(run)
    fwd = make_predict_fn(task)
    live = np.asarray(
        fwd(state["params"], state["batch_stats"], x, jax.random.PRNGKey(0))
    )
    np.testing.assert_allclose(probs, live, atol=1e-6)


def test_export_sampler_roundtrip(tmp_path):
    train_main([
        "--experiment", "img_only", "--log_dir", str(tmp_path / "bb"),
        "--max_steps", "2", "--val_freq", "2", "--log_freq", "2",
        "--val_steps", "4", "--n_sampled_imgs", "2",
    ] + ARGS)
    run = str(tmp_path / "CXR14" / "bb")

    from tedm_tpu.serve.export import export_sampler, load_exported

    out = str(tmp_path / "sampler.bin")
    n = export_sampler(run, out, batch_size=2, sampler="dpmpp", num_steps=4)
    assert n > 1000
    sample = load_exported(out)
    import jax

    imgs = sample(np.asarray(jax.random.PRNGKey(1), np.uint32))
    assert imgs.shape == (2, 16, 16, 1)
    assert np.isfinite(imgs).all() and imgs.min() >= 0 and imgs.max() <= 1


def test_export_sampler_joint_and_conditional(tmp_path):
    """Regression: export_sampler traced config.channels (always 1) so any
    joint (2-channel) or conditional (cond-concat) checkpoint failed to
    export. Now mode channels mirror the trainer; conditional exports take
    the conditioning batch as a second argument."""
    import jax

    from tedm_tpu.serve.export import export_sampler, load_exported

    train_main([
        "--experiment", "joint", "--log_dir", str(tmp_path / "j"),
        "--max_steps", "2", "--val_freq", "2", "--log_freq", "2",
        "--val_steps", "4", "--n_sampled_imgs", "2",
    ] + ARGS)
    out = str(tmp_path / "joint.bin")
    export_sampler(str(tmp_path / "joint" / "None" / "j"), out,
                   batch_size=2, sampler="ddim", num_steps=3)
    imgs = load_exported(out)(np.asarray(jax.random.PRNGKey(1), np.uint32))
    assert imgs.shape == (2, 16, 16, 2)  # (img, seg) channel pair

    train_main([
        "--experiment", "conditional", "--log_dir", str(tmp_path / "c"),
        "--max_steps", "2", "--val_freq", "2", "--log_freq", "2",
        "--val_steps", "4", "--n_sampled_imgs", "2",
    ] + ARGS)
    out = str(tmp_path / "cond.bin")
    export_sampler(str(tmp_path / "conditional" / "None" / "c"), out,
                   batch_size=2, sampler="ddim", num_steps=3)
    cond = np.zeros((2, 16, 16, 1), np.float32)
    segs = load_exported(out)(np.asarray(jax.random.PRNGKey(1), np.uint32), cond)
    assert segs.shape == (2, 16, 16, 1)
    assert np.isfinite(segs).all()
