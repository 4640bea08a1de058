"""Joint/conditional diffusion variants (reference:
trainers/train_base_diffusion.py modes, run_tests.py:121-137 conditional
eval): train end-to-end at toy size, then the 5-run averaged sampling
evaluation."""

import os

import numpy as np

from tedm_tpu.train import main as train_main

ARGS = [
    "--synthetic_data", "--dim", "8", "--dim_mults", "1", "2",
    "--img_size", "16", "--batch_size", "4", "--timesteps", "8",
    "--num_workers", "1", "--val_steps", "4", "--max_val_steps", "1",
    "--n_sampled_imgs", "2",
]


def test_joint_trains(tmp_path):
    train_main([
        "--experiment", "joint", "--log_dir", str(tmp_path / "j"),
        "--max_steps", "2", "--val_freq", "2", "--log_freq", "2",
    ] + ARGS)
    assert os.path.isdir(str(tmp_path / "joint" / "None" / "j" / "best" / "state"))


def test_joint_and_cond_trains(tmp_path):
    """The reference's third mode (train_base_diffusion.py:31-32, broken
    there: undefined config.joint_training + ignored cond). Here: p(img|seg)
    with real channel-concat conditioning."""
    train_main([
        "--experiment", "joint_and_cond", "--log_dir", str(tmp_path / "jc"),
        "--max_steps", "2", "--val_freq", "2", "--log_freq", "2",
    ] + ARGS)
    assert os.path.isdir(
        str(tmp_path / "joint_and_cond" / "None" / "jc" / "best" / "state")
    )


def test_joint_channel_loss_split():
    """aux_channel_losses: per-channel means recombine to the total loss."""
    import jax
    import jax.numpy as jnp

    from tedm_tpu.models.diffusion import train_loss
    from tedm_tpu.ops.schedules import make_schedule

    sched = make_schedule(8, "cosine")
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (4, 8, 8, 2))
    apply_fn = lambda x, t: jnp.zeros_like(x)
    total, per_ch = train_loss(
        apply_fn, sched, jax.random.PRNGKey(1), x0, aux_channel_losses=True
    )
    assert per_ch.shape == (2,)
    np.testing.assert_allclose(
        float(per_ch.mean()), float(total), rtol=1e-5
    )
    alone = train_loss(apply_fn, sched, jax.random.PRNGKey(1), x0)
    np.testing.assert_allclose(float(alone), float(total), rtol=1e-6)


def test_conditional_trains_and_sampling_eval(tmp_path):
    train_main([
        "--experiment", "conditional", "--log_dir", str(tmp_path / "c"),
        "--max_steps", "2", "--val_freq", "2", "--log_freq", "2",
        "--ddim_steps", "4",  # fast-sampling path in the conditional eval
    ] + ARGS)
    run = str(tmp_path / "conditional" / "None" / "c")

    from tedm_tpu.eval.run_tests import evaluate_experiment

    results = evaluate_experiment(run)
    assert set(results) == {"JSRT_val", "JSRT_test", "NIH", "Montgomery"}
    y_hat = results["JSRT_val"]["y_hat"]
    assert y_hat.shape[1:] == (16, 16, 1)
    assert np.isfinite(y_hat).all()
    # averaged sigmoid-free samples live in [0, 1]-ish after unnormalize
    assert y_hat.min() >= -0.6 and y_hat.max() <= 1.6
