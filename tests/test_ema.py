"""EMA parameter averaging for the diffusion backbone (new capability —
the reference has no EMA; trainers/train_CXR14.py steps raw Adam weights).

Pins: (a) the exact EMA recurrence inside the jitted step
(ema_{k+1} = d * ema_k + (1-d) * params_{k+1}, seeded ema_0 = params_0),
(b) the checkpoint contract (ema_params saved beside params, restored on
resume), and (c) downstream consumers (feature-extraction backbone load,
eval harness) preferring the EMA weights."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tedm_tpu.config import config_from_args
from tedm_tpu.train import main as train_main

ARGS = [
    "--synthetic_data", "--dim", "8", "--dim_mults", "1", "2",
    "--img_size", "32", "--batch_size", "4", "--timesteps", "20",
    "--val_steps", "5", "--n_sampled_imgs", "2", "--num_workers", "1",
]


def _tree_allclose(a, b, atol=1e-6):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


def _tree_any_differs(a, b):
    return any(
        not np.allclose(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


def test_ema_step_recurrence():
    from tedm_tpu.ops.schedules import make_schedule
    from tedm_tpu.trainers import diffusion as D

    config = config_from_args(
        ["--experiment", "img_only", "--ema_decay", "0.5"] + ARGS
    ).apply_experiment_preset()
    unet = D.build_model(config)
    sched = make_schedule(config.timesteps, config.beta_schedule,
                          config.p2_loss_weight_gamma, config.p2_loss_weight_k)
    tx = optax.adam(config.lr)
    train_step, _, _ = D.make_steps(config, unet, sched, tx)

    rng = jax.random.PRNGKey(0)
    params = D.init_params(config, unet, rng)
    opt_state = tx.init(params)
    ema = jax.tree_util.tree_map(jnp.copy, params)

    x = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 1)))
    cond = np.zeros((1,), np.float32)
    valid = np.ones((4,), np.float32)

    d = 0.5
    expect_ema = jax.tree_util.tree_map(np.asarray, params)
    for k in range(3):
        params, opt_state, ema, _, _ = train_step(
            params, opt_state, ema, x, cond, valid, jax.random.PRNGKey(10 + k)
        )
        p_host = jax.tree_util.tree_map(np.asarray, params)
        expect_ema = jax.tree_util.tree_map(
            lambda e, p: e * d + p * (1.0 - d), expect_ema, p_host
        )
        _tree_allclose(ema, expect_ema)
    # the average genuinely lags the live weights
    assert _tree_any_differs(ema, params)


def test_ema_checkpoint_resume_and_downstream(tmp_path):
    logdir = tmp_path / "bb"
    ema_args = ["--experiment", "img_only", "--log_dir", str(logdir),
                "--ema_decay", "0.9", "--max_steps", "2", "--val_freq", "2",
                "--log_freq", "2", "--max_val_steps", "1"] + ARGS
    train_main(ema_args)
    best = os.path.join(str(tmp_path / "CXR14" / "bb"), "best")
    assert os.path.isdir(os.path.join(best, "state"))

    # the checkpoint carries BOTH raw and EMA weights, and they differ
    from tedm_tpu.eval.harness import load_diffusion_experiment
    from tedm_tpu.trainers import diffusion as D
    from tedm_tpu.utils.checkpoint import load_checkpoint, load_config

    old = load_config(best)
    assert old.ema_decay == pytest.approx(0.9)
    unet = D.build_model(old)
    t = D.init_params(old, unet, jax.random.PRNGKey(0))
    template = {"params": t, "opt_state": optax.adam(old.lr).init(t),
                "step": 0, "ema_params": t}
    state, _ = load_checkpoint(best, template, old, verbose=False)
    assert _tree_any_differs(state["ema_params"], state["params"])

    # the eval harness serves the EMA weights
    _, served, _, _ = load_diffusion_experiment(str(tmp_path / "CXR14" / "bb"))
    _tree_allclose(served, state["ema_params"])

    # --serve_raw_params overrides the preference (the EMA-vs-raw A/B on one
    # checkpoint): load_backbone must hand back the RAW weights
    from tedm_tpu.config import config_from_args
    from tedm_tpu.trainers.datasetdm import load_backbone

    raw_cfg = config_from_args(
        ["--experiment", "TEDM", "--saved_diffusion_model", best,
         "--serve_raw_params"] + ARGS)
    _, served_raw, _ = load_backbone(raw_cfg, jax.random.PRNGKey(0))
    _tree_allclose(served_raw, state["params"])
    ema_cfg = config_from_args(
        ["--experiment", "TEDM", "--saved_diffusion_model", best] + ARGS)
    _, served_ema, _ = load_backbone(ema_cfg, jax.random.PRNGKey(0))
    _tree_allclose(served_ema, state["ema_params"])

    # resume restores the EMA subtree and keeps averaging
    train_main(["--experiment", "img_only", "--log_dir", str(tmp_path / "bb2"),
                "--ema_decay", "0.9", "--max_steps", "4", "--val_freq", "2",
                "--log_freq", "2", "--max_val_steps", "1",
                "--resume_path", best] + ARGS)

    # a TEDM run consuming the EMA backbone works end-to-end
    train_main([
        "--experiment", "TEDM", "--debug", "--n_labelled_images", "3",
        "--log_dir", str(tmp_path / "tedm"),
        "--saved_diffusion_model", best,
    ] + ARGS)
