"""Regression: a finetuned-from-CL checkpoint must restore against the
full-UNet eval template (the lazy CL init lacks FiLM/decoder params; a
shallow warm-start merge used to drop them from the saved state)."""

import jax
import jax.numpy as jnp

from tedm_tpu.train import main as train_main

ARGS = [
    "--synthetic_data", "--dim", "8", "--dim_mults", "1", "2",
    "--img_size", "16", "--batch_size", "2", "--timesteps", "8",
    "--num_workers", "1", "--max_val_steps", "1", "--tau", "0.1",
]


def test_cl_finetune_checkpoint_evaluates(tmp_path):
    train_main([
        "--experiment", "global_cl", "--log_dir", str(tmp_path / "g"),
        "--max_steps", "2", "--val_freq", "2", "--log_freq", "2",
    ] + ARGS)
    gbest = str(tmp_path / "global_cl" / "None" / "g" / "best")
    train_main([
        "--experiment", "global_finetune", "--n_labelled_images", "3",
        "--global_model_path", gbest, "--log_dir", str(tmp_path / "f"),
        "--max_steps", "2", "--val_freq", "2", "--log_freq", "2",
    ] + ARGS)
    run = str(tmp_path / "global_finetune" / "3" / "f")

    from tedm_tpu.eval.run_tests import evaluate_experiment

    results = evaluate_experiment(run)
    assert set(results) == {"JSRT_val", "JSRT_test", "NIH", "Montgomery"}

    # the warm-started model must still have its FiLM layers
    from tedm_tpu.utils.checkpoint import load_config
    from tedm_tpu.eval.harness import load_experiment

    config, state, task = load_experiment(run)
    assert "time_proj" in state["params"]["downs_0_0"]


def test_finetune_unfreeze_with_weight_decay_restores(tmp_path):
    """Regression: the step-gated-unfreeze finetune used a forked loop with
    hardcoded optax.adam, so --weight_decay checkpoints saved adam state but
    eval rebuilt an adamw template -> restore structure mismatch. Both paths
    now run through the shared loop."""
    train_main([
        "--experiment", "global_cl", "--log_dir", str(tmp_path / "g"),
        "--max_steps", "2", "--val_freq", "2", "--log_freq", "2",
    ] + ARGS)
    gbest = str(tmp_path / "global_cl" / "None" / "g" / "best")
    train_main([
        "--experiment", "global_finetune", "--n_labelled_images", "3",
        "--global_model_path", gbest, "--log_dir", str(tmp_path / "fu"),
        "--max_steps", "3", "--val_freq", "3", "--log_freq", "3",
        "--unfreeze_weights_at_step", "2", "--weight_decay", "1e-4",
    ] + ARGS)
    run = str(tmp_path / "global_finetune" / "3" / "fu")

    from tedm_tpu.eval.run_tests import evaluate_experiment

    results = evaluate_experiment(run)
    assert set(results) == {"JSRT_val", "JSRT_test", "NIH", "Montgomery"}
