"""Batch evaluation harness (reference: auxiliary/postprocessing/run_tests.py).

    python -m tedm_tpu.eval.run_tests --experiment <logdir>/<n>/<ts> [--rerun]
        [--nih_path DIR] [--mon_path DIR]

Evaluates the checkpointed model over JSRT_val / JSRT_test / NIH /
Montgomery, writes ``{dataset}_predictions.npz`` (keys: y_hat, y_star,
dice, precision, recall) into the experiment directory, prints
mean+/-std metrics, and skips datasets already evaluated unless
``--rerun`` (run_tests.py:40-49,107-113). For shared-weights (TEDM)
checkpoints the prediction is the sigmoid ensembled over timesteps
(the per-timestep breakdown lives in testing_shared_weights)."""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from tedm_tpu.eval.harness import (
    DATASET_KEYS,
    build_test_loaders,
    compute_output,
    load_experiment,
    load_output,
    predict_dataset,
    print_metrics,
    save_output,
)


def evaluate_experiment(
    exp_dir: str,
    rerun: bool = False,
    nih_path: str = None,
    mon_path: str = None,
) -> dict:
    """Programmatic entrypoint; returns {dataset_key: output dict}."""
    files = set(os.listdir(exp_dir))
    all_done = {f"{k}_predictions.npz" for k in DATASET_KEYS} <= files
    results = {}
    if all_done and not rerun:
        print("Experiment already tested")
        for key in DATASET_KEYS:
            out = load_output(os.path.join(exp_dir, f"{key}_predictions.npz"))
            print_metrics(key, out)
            results[key] = out
        return results

    from tedm_tpu.utils.checkpoint import load_config

    config = load_config(os.path.join(exp_dir, "best"))
    conditional = config.experiment == "conditional"
    from tedm_tpu.eval.harness import eval_parallel_setup

    if conditional:
        from tedm_tpu.eval.harness import (
            load_diffusion_experiment,
            make_conditional_sampler,
            predict_conditional_dataset,
        )

        config, params, unet, sched = load_diffusion_experiment(exp_dir)
        # shard eval batches over the mesh 'data' axis; params replicated
        # (or TP-sharded) by the same config-driven rule the trainers use
        shard, put_params = eval_parallel_setup(config)
        params = put_params(params)
        # build the jitted sampling scan ONCE for all four datasets
        run_once = make_conditional_sampler(config, unet, sched)
        task = state = None
    else:
        config, state, task = load_experiment(exp_dir)
        shard, put_params = eval_parallel_setup(config)
        state["params"] = put_params(state["params"])
        state["batch_stats"] = put_params(state["batch_stats"])
        from tedm_tpu.eval.harness import make_predict_fn

        fwd = make_predict_fn(task)
    loaders = build_test_loaders(config, nih_path, mon_path)
    rng = jax.random.PRNGKey(config.seed + 777)

    for key, loader in loaders.items():
        path = os.path.join(exp_dir, f"{key}_predictions.npz")
        if os.path.exists(path) and not rerun:
            print(f"{key} already tested")
            out = load_output(path)
            print_metrics(key, out)
            results[key] = out
            continue
        print(f"Testing {key} set")
        rng, sub = jax.random.split(rng)
        if conditional:
            # 5 full reverse-sampling runs averaged (run_tests.py:121-137).
            y_hat, y_star = predict_conditional_dataset(
                config, params, unet, sched, loader, sub, run_once=run_once,
                shard=shard,
            )
        else:
            y_hat, y_star = predict_dataset(
                task, state, loader, sub, fold=task.fold, fwd=fwd, shard=shard
            )
            if task.fold > 1:
                y_hat = y_hat.mean(axis=0)  # ensemble over timesteps (app.py:79)
        out = compute_output(y_hat, y_star)
        print_metrics(key, out)
        save_output(path, out)
        results[key] = out
    return results


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiment", "-e", type=str, required=True,
                        help="Experiment path")
    parser.add_argument("--rerun", "-r", default=False, action="store_true",
                        help="Run the test again")
    parser.add_argument("--nih_path", type=str, default=None)
    parser.add_argument("--mon_path", type=str, default=None)
    args = parser.parse_args(argv)
    if os.path.isdir(args.experiment):
        print("Experiment path identified as a directory")
    else:
        raise ValueError("Experiment path is not a directory")
    evaluate_experiment(args.experiment, args.rerun, args.nih_path, args.mon_path)


if __name__ == "__main__":
    main()
