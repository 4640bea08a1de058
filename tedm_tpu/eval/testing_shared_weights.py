"""TEDM evaluation: per-timestep metrics + timestep ensemble
(reference: auxiliary/postprocessing/testing_shared_weights.py).

    python -m tedm_tpu.eval.testing_shared_weights --experiment <dir> [--rerun]

Per dataset: writes ``{dataset}_timestep{t}_predictions.npz`` for every
t in the checkpoint's ``t_steps_to_save`` plus the ensembled
``{dataset}_predictions.npz`` (mean sigmoid over timesteps, >0.5
threshold applied in the metrics), with identical metric printing."""

from __future__ import annotations

import argparse
import os
import sys

import jax

from tedm_tpu.eval.harness import (
    DATASET_KEYS,
    build_test_loaders,
    compute_output,
    load_experiment,
    predict_dataset,
    print_metrics,
    save_output,
)


def evaluate_shared_weights(
    exp_dir: str, rerun: bool = False, nih_path: str = None, mon_path: str = None
) -> dict:
    files = set(os.listdir(exp_dir))
    if {f"{k}_predictions.npz" for k in DATASET_KEYS} <= files and not rerun:
        print("Experiment already tested")
        return {}

    config, state, task = load_experiment(exp_dir)
    if not config.shared_weights_over_timesteps:
        raise ValueError(f"Experiment {config.experiment} not recognized "
                         "(expected a shared-weights TEDM checkpoint)")
    t_steps = tuple(config.t_steps_to_save)
    from tedm_tpu.eval.harness import eval_parallel_setup, make_predict_fn

    # shard eval batches over the mesh 'data' axis (VERDICT r2 #7)
    shard, put_params = eval_parallel_setup(config)
    state["params"] = put_params(state["params"])
    state["batch_stats"] = put_params(state["batch_stats"])
    fwd = make_predict_fn(task)
    loaders = build_test_loaders(config, nih_path, mon_path)
    rng = jax.random.PRNGKey(config.seed + 778)
    results = {}

    for key, loader in loaders.items():
        if f"{key}_predictions.npz" in files and not rerun:
            print(f"{key} already tested")
            continue
        print(f"Testing {key} set")
        rng, sub = jax.random.split(rng)
        y_hats, y_star = predict_dataset(
            task, state, loader, sub, fold=task.fold, fwd=fwd, shard=shard
        )
        # y_hats: (S, N, H, W, C), step-major like the reference rearrange
        # '(b step) 1 h w -> step b 1 h w' (testing_shared_weights.py:120).
        for i, t in enumerate(t_steps):
            out = compute_output(y_hats[i], y_star)
            print_metrics(f"{key} {t}", out)
            save_output(
                os.path.join(exp_dir, f"{key}_timestep{t}_predictions.npz"), out
            )
        ens = compute_output(y_hats.mean(axis=0), y_star)
        print_metrics(key, ens)
        save_output(os.path.join(exp_dir, f"{key}_predictions.npz"), ens)
        results[key] = ens
    return results


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiment", "-e", type=str, required=True)
    parser.add_argument("--rerun", "-r", default=False, action="store_true")
    parser.add_argument("--nih_path", type=str, default=None)
    parser.add_argument("--mon_path", type=str, default=None)
    args = parser.parse_args(argv)
    if os.path.isdir(args.experiment):
        print("Experiment path identified as a directory")
    else:
        raise ValueError("Experiment path is not a directory")
    evaluate_shared_weights(args.experiment, args.rerun, args.nih_path, args.mon_path)


if __name__ == "__main__":
    main()
