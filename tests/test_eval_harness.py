"""End-to-end eval-harness integration: tiny TEDM -> run_tests ->
artifacts + idempotent skip -> per-timestep harness -> reporting table
(SURVEY §4: the reference's 'testing' is model evaluation; this is the
automated version)."""

import os

import numpy as np
import pytest

from tedm_tpu.train import main as train_main

ARGS = [
    "--synthetic_data", "--dim", "8", "--dim_mults", "1", "2",
    "--img_size", "16", "--batch_size", "2", "--timesteps", "10",
    "--num_workers", "1", "--t_steps_to_save", "1", "5",
]


@pytest.fixture(scope="module")
def tedm_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("eval")
    train_main([
        "--experiment", "LEDM", "--n_labelled_images", "3",
        "--log_dir", str(root / "run"), "--max_steps", "2",
        "--val_freq", "2", "--log_freq", "2", "--max_val_steps", "1",
        "--saved_diffusion_model", str(root / "missing"),
    ] + ARGS)
    # LEDM preset overrides t_steps; the run dir layout is logs/<exp>/<n>/<base>
    return str(root / "LEDM" / "3" / "run")


def test_run_tests_and_skip(tedm_run, capsys):
    from tedm_tpu.eval.run_tests import evaluate_experiment

    results = evaluate_experiment(tedm_run)
    assert set(results) == {"JSRT_val", "JSRT_test", "NIH", "Montgomery"}
    for out in results.values():
        assert {"y_hat", "y_star", "dice", "precision", "recall"} <= set(out)
        assert len(out["dice"]) == len(out["y_hat"])
    assert os.path.exists(os.path.join(tedm_run, "NIH_predictions.npz"))
    # idempotent second call loads from disk
    results2 = evaluate_experiment(tedm_run)
    np.testing.assert_array_equal(
        results["JSRT_val"]["dice"], results2["JSRT_val"]["dice"]
    )
    assert "already tested" in capsys.readouterr().out


def test_reporting_tables(tedm_run, capsys):
    from tedm_tpu.reporting.tables import collect_metrics, print_main_table

    logs_root = os.path.dirname(os.path.dirname(os.path.dirname(tedm_run)))
    rec = collect_metrics(logs_root, ["LEDM"], datasizes=(3,))
    assert len(rec["dice"]) == 25 + 100 + 100  # JSRT_test + NIH + Montgomery
    print_main_table(rec, ["LEDM"], datasizes=(3,))
    out = capsys.readouterr().out
    assert "LEDM" in out and "$\\pm$" in out
