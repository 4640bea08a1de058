"""Shared evaluation plumbing for run_tests / testing_shared_weights.

Responsibilities (reference: auxiliary/postprocessing/run_tests.py):
* locate + restore the experiment checkpoint (our Orbax layout:
  ``<dir>/best/state`` with ``config.json`` beside it);
* rebuild the right model/task from the embedded config.experiment
  (run_tests.py:63-70 — we use the real experiment names the dispatcher
  sets, fixing the reference's 'datasetDM' string mismatch, and accept the
  reference aliases too);
* the four test datasets: JSRT val/test (same split CSVs), NIH,
  Montgomery — or their synthetic stand-ins (run_tests.py:83-91);
* sigmoid predictions accumulated per dataset; per-image Dice/precision/
  recall; ``.npz`` persistence with idempotent skip.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tedm_tpu.config import Config
from tedm_tpu.data import Loader, NIHDataset, MonDataset, SyntheticCXRDataset, build_dataloaders
from tedm_tpu.ops import metrics as M
from tedm_tpu.utils.checkpoint import load_checkpoint, load_config

DATASET_KEYS = ("JSRT_val", "JSRT_test", "NIH", "Montgomery")


def load_experiment(exp_dir: str) -> Tuple[Config, Dict[str, Any], Any]:
    """Restore (config, state, task) from an experiment directory."""
    if not os.path.isdir(exp_dir):
        raise ValueError("Experiment path is not a directory")
    ckpt = os.path.join(exp_dir, "best")
    if not os.path.isdir(os.path.join(ckpt, "state")):
        raise ValueError(f"No checkpoint found in {exp_dir} (expected best/state)")
    config = load_config(ckpt)
    task = build_eval_task(config)
    tx = (
        optax.adamw(config.lr, weight_decay=config.weight_decay)
        if config.weight_decay
        else optax.adam(config.lr)
    )
    template = {
        "params": task.params,
        "batch_stats": task.batch_stats,
        "opt_state": tx.init(task.params),
        "step": 0,
    }
    state, _ = load_checkpoint(ckpt, template, config)
    return config, state, task


def build_eval_task(config: Config):
    """Experiment name -> SegTask (reference model pick, run_tests.py:63-70).
    Accepts both our experiment taxonomy and the reference aliases."""
    rng = jax.random.PRNGKey(0)
    exp = config.experiment
    if exp in ("baseline", "global_finetune", "glob_loc_finetune"):
        from tedm_tpu.trainers.baseline import build_task

        return build_task(config, rng)
    if exp in ("LEDM", "LEDMe", "TEDM", "datasetDM"):
        from tedm_tpu.trainers.datasetdm import build_task

        return build_task(config, rng)
    if exp in ("PDDM", "simple_datasetDM"):
        from tedm_tpu.trainers.per_step import build_task as build_probe

        # compute_stats=False: the checkpoint restore that follows this call
        # overwrites the feature moments anyway; re-running the full-dataset
        # pre-pass here (the old behavior) cost one frozen-backbone forward
        # per train image at every eval/serve load.
        return build_probe(config, rng, compute_stats=False)
    raise ValueError(f"Experiment {exp} not recognized")


def build_jsrt_loaders(config: Config) -> Dict[str, Loader]:
    return build_dataloaders(
        "JSRT", config.data_dir, config.img_size, config.batch_size,
        config.num_workers, config.n_labelled_images, seed=config.seed,
        synthetic=config.synthetic_data,
        splits_dir=getattr(config, "splits_dir", None),
    )


def build_test_loaders(
    config: Config,
    nih_path: Optional[str] = None,
    mon_path: Optional[str] = None,
    mon_csv: str = "patient_data.csv",
) -> Dict[str, Loader]:
    """The four eval sets (reference: run_tests.py:83-91). With synthetic
    data (or missing paths) the cross-domain sets are deterministic
    synthetic stand-ins of the reference sizes (NIH=100, Montgomery=100)."""
    jsrt = build_jsrt_loaders(config)
    mk = lambda ds: Loader(ds, config.batch_size, num_workers=config.num_workers)
    out = {"JSRT_val": jsrt["val"], "JSRT_test": jsrt["test"]}
    sdir = getattr(config, "splits_dir", None)
    if config.synthetic_data or nih_path is None:
        out["NIH"] = mk(SyntheticCXRDataset("nih", 100, config.img_size, seed=config.seed))
    else:
        nih_kw = {"splits_dir": sdir} if sdir else {}
        out["NIH"] = mk(NIHDataset(nih_path, img_size=config.img_size, **nih_kw))
    if config.synthetic_data or mon_path is None:
        out["Montgomery"] = mk(
            SyntheticCXRDataset("montgomery", 100, config.img_size, seed=config.seed)
        )
    else:
        # Montgomery's CSV ships with the data itself (reference MONPATH
        # doubles as csv_path, run_tests.py:88-90) unless a splits_dir
        # overrides it (custom corpora, e.g. the parity export).
        out["Montgomery"] = mk(
            MonDataset(mon_path, mon_csv, img_size=config.img_size,
                       splits_dir=sdir or mon_path)
        )
    return out


def eval_parallel_setup(config: Config):
    """(shard_batch_fn, put_params_fn) for evaluation — the SAME config-
    driven mesh wiring the trainers use (parallel.data_parallel_setup), so
    predict paths use every visible device instead of one (VERDICT r2 #7:
    conditional eval runs 5 full reverse scans per batch — on an 8-chip
    mesh the batch shards over 'data' and each chip samples its slice).
    Identity on a single device or an indivisible batch."""
    from tedm_tpu.parallel import data_parallel_setup

    return data_parallel_setup(config, config.batch_size)


def load_diffusion_experiment(exp_dir: str):
    """Restore a diffusion checkpoint (img_only/joint/conditional) as
    (config, params, unet, schedule)."""
    from tedm_tpu.trainers import diffusion as D
    from tedm_tpu.ops.schedules import make_schedule

    ckpt = os.path.join(exp_dir, "best")
    config = load_config(ckpt)
    unet = D.build_model(config)
    params = D.init_params(config, unet, jax.random.PRNGKey(0))
    # mirror the trainer's tx selection (adamw iff weight_decay) — the
    # chain state structures differ and the restore template must match
    tx = (optax.adamw(config.lr, weight_decay=config.weight_decay)
          if config.weight_decay else optax.adam(config.lr))
    template = {"params": params, "opt_state": tx.init(params),
                "step": 0}
    if config.ema_decay > 0.0:
        template["ema_params"] = params
    state, _ = load_checkpoint(ckpt, template, config)
    sched = make_schedule(config.timesteps, config.beta_schedule,
                          config.p2_loss_weight_gamma, config.p2_loss_weight_k)
    # prefer the EMA weights when the backbone was trained with --ema_decay;
    # the checkpoint-embedded --serve_raw_params overrides (EMA-vs-raw A/B)
    served = (state["params"] if getattr(config, "serve_raw_params", False)
              else state.get("ema_params", state["params"]))
    return config, served, unet, sched


def make_conditional_sampler(config, unet, sched):
    """Jitted one-trajectory conditional sampler — build ONCE per
    experiment and reuse across the four eval datasets (a fresh closure
    per dataset would recompile the full-UNet sampling scan 4×, minutes
    each through the axon tunnel)."""
    from tedm_tpu.models.diffusion import ddim_sample_loop, sample_loop

    @jax.jit
    def run_once(p, cond, r):
        apply_fn = lambda x, t: unet.apply(
            {"params": p}, jnp.concatenate([x, cond], axis=-1), t
        )
        if config.ddim_steps > 0:
            x0 = ddim_sample_loop(
                apply_fn, sched, r, cond.shape[:3] + (1,),
                num_steps=config.ddim_steps,
                objective=config.objective,
                dynamic_threshold_percentile=config.dynamic_threshold_percentile,
            )
        else:
            x0 = sample_loop(
                apply_fn, sched, r, cond.shape[:3] + (1,),
                objective=config.objective,
                dynamic_threshold_percentile=config.dynamic_threshold_percentile,
            )
        return x0 * 0.5 + 0.5  # unnormalize (run_tests.py:131)

    return run_once


def predict_conditional_dataset(
    config, params, unet, sched, loader, rng, n_runs: int = 5, run_once=None,
    shard=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """The reference's most expensive inference path (run_tests.py:121-137):
    per batch, ``n_runs`` independent full reverse-sampling trajectories of
    the segmentation conditioned on the image, averaged. Here each run is
    one jitted lax.scan instead of 1000 Python-level kernel launches. Pass
    a prebuilt ``run_once`` (make_conditional_sampler) when evaluating
    several datasets, and ``shard`` (eval_parallel_setup) to spread the
    batch over the mesh's 'data' axis — params must then be placed with
    the matching put_params_fn."""
    if run_once is None:
        run_once = make_conditional_sampler(config, unet, sched)

    y_hats, y_stars = [], []
    for batch in loader:
        img = batch["image"]
        if shard is not None:
            img = shard({"image": img})["image"]
        cond = jnp.asarray(img, jnp.float32) * 2.0 - 1.0
        runs = []
        for _ in range(n_runs):
            rng, sub = jax.random.split(rng)
            runs.append(np.asarray(run_once(params, cond, sub)))
        pred = np.stack(runs, axis=-1).mean(axis=-1)
        nvalid = int(batch["valid"].sum())
        y_hats.append(pred[:nvalid])
        y_stars.append(batch["mask"][:nvalid])
    return np.concatenate(y_hats), np.concatenate(y_stars)


def make_predict_fn(task):
    """Jitted sigmoid forward — build ONCE per experiment and reuse across
    datasets (a fresh closure per dataset would recompile 4x)."""

    @jax.jit
    def fwd(params, bs, x, r):
        logits, _ = task.apply(params, bs, x, r, False)
        return jax.nn.sigmoid(logits.astype(jnp.float32))

    return fwd


def predict_dataset(
    task, state, loader, rng, fold: int = 1, fwd=None, shard=None
) -> Tuple[np.ndarray, np.ndarray]:
    """Sigmoid predictions over a loader. Returns (y_hat, y_star) with
    y_hat (fold*N, H, W, C) folded step-major when fold > 1. ``shard``
    (eval_parallel_setup) spreads the batch over the mesh's 'data' axis;
    state params/batch_stats must then be placed with the matching
    put_params_fn."""
    if fwd is None:
        fwd = make_predict_fn(task)

    y_hats, y_stars = [], []
    for batch in loader:
        rng, sub = jax.random.split(rng)
        img = batch["image"]
        if shard is not None:
            img = shard({"image": img})["image"]
        pred = np.asarray(fwd(state["params"], state["batch_stats"], img, sub))
        nvalid = int(batch["valid"].sum())
        B = len(batch["valid"])
        if fold > 1:
            pred = pred.reshape(fold, B, *pred.shape[1:])[:, :nvalid]
        else:
            pred = pred[:nvalid]
        y_hats.append(pred)
        y_stars.append(batch["mask"][:nvalid])
    axis = 1 if fold > 1 else 0
    return np.concatenate(y_hats, axis=axis), np.concatenate(y_stars, axis=0)


def compute_output(y_hat: np.ndarray, y_star: np.ndarray) -> Dict[str, np.ndarray]:
    """The persisted artifact dict (reference: run_tests.py:150-156)."""
    pred = jnp.asarray(y_hat > 0.5)
    target = jnp.asarray(y_star)
    return {
        "y_hat": y_hat,
        "y_star": y_star,
        "dice": np.asarray(M.dice(pred, target)),
        "precision": np.asarray(M.precision(pred, target)),
        "recall": np.asarray(M.recall(pred, target)),
    }


def print_metrics(name: str, output: Dict[str, np.ndarray]) -> None:
    """Identical formatting to the reference (run_tests.py:157-159)."""
    print(f"{name} metrics: \n\tdice:      "
          f"{np.nanmean(output['dice']):.3}+/-{np.nanstd(output['dice']):.3}")
    print(f"\tprecision: {np.nanmean(output['precision']):.3}"
          f"+/-{np.nanstd(output['precision']):.3}")
    print(f"\trecall:    {np.nanmean(output['recall']):.3}"
          f"+/-{np.nanstd(output['recall']):.3}")


def save_output(path: str, output: Dict[str, np.ndarray]) -> None:
    np.savez_compressed(path, **output)


def load_output(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}
