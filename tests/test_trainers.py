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


def test_frozen_params_bit_identical_under_adamw():
    """ADVICE r1 (medium): adamw's decoupled weight decay is applied in
    tx.update regardless of gradients, so masking grads alone still decays
    'frozen' params by lr*wd per step. The reference freeze
    (requires_grad=False) keeps them bit-identical; so must ours."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from tedm_tpu.trainers.common import SegTask, make_train_step

    params = {
        "frozen_w": jnp.ones((3, 3)) * 0.7,
        "live_w": jnp.ones((3, 3)) * 0.3,
    }

    def apply(p, aux, x, rng, train):
        # logits shaped like a (B,H,W,C) mask problem
        out = (x * (p["frozen_w"].sum() + p["live_w"].sum()))
        return out, aux

    task = SegTask(apply=apply, params=params, batch_stats={})
    tx = optax.adamw(1e-2, weight_decay=0.1)
    mask = {
        "frozen_w": jnp.zeros((3, 3)),
        "live_w": jnp.ones((3, 3)),
    }
    step = make_train_step(task, tx, freeze_mask=mask, unfreeze_at=5)
    opt_state = tx.init(params)
    # the jitted step donates params; snapshot host copies before stepping
    frozen0 = np.asarray(params["frozen_w"]).copy()
    live0 = np.asarray(params["live_w"]).copy()
    x = jnp.ones((2, 4, 4, 1))
    y = jnp.zeros((2, 4, 4, 1))
    valid = jnp.ones((2,))
    p = params
    for i in range(1, 4):  # frozen window
        p, _, opt_state, _, _ = step(
            p, {}, opt_state, x, y, valid, jax.random.PRNGKey(i), jnp.int32(i)
        )
    np.testing.assert_array_equal(np.asarray(p["frozen_w"]), frozen0)
    assert not np.array_equal(np.asarray(p["live_w"]), live0)
    # after the unfreeze step the frozen subtree moves too
    p2, _, opt_state, _, _ = step(
        p, {}, opt_state, x, y, valid, jax.random.PRNGKey(9), jnp.int32(5)
    )
    assert not np.array_equal(np.asarray(p2["frozen_w"]), frozen0)
