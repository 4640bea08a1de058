"""The shared supervised segmentation loop, TPU-native.

Reference behavior (trainers/train_baseline.py:17-161): infinite epochs
until max_steps; per-pixel BCE-with-logits reduced 'b c h w -> b c' then
mean; labels repeated ×S for shared-weights heads; avg train loss logged
every log_freq; validation every val_freq computes loss + Dice/precision/
recall (sigmoid > .5, nanmean across images); best-val checkpointing;
optional early stop at 1.5× best val loss; ``debug`` runs one step of
everything and returns.

Reference defects fixed here (SURVEY "Gotchas"): shared-weights behavior
keys on ``config.shared_weights_over_timesteps`` alone (the reference also
required ``experiment == 'datasetDM'`` which the dispatcher never sets);
AMP actually works (bf16 compute dtype) instead of the broken GradScaler
usage; periodic checkpointing is available via ``ckpt_every``.

TPU-native structure: ONE jitted train step (forward+loss+backward+Adam)
with the batch sharded over the mesh 'data' axis and params replicated —
GSPMD inserts the gradient psum over ICI. The step is masked for padding
rows, so static shapes hold for any dataset size.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Callable, Dict, Iterable, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import Array

from tedm_tpu.config import Config
from tedm_tpu.ops import metrics as M
from tedm_tpu.utils.checkpoint import save_checkpoint
from tedm_tpu.utils.logging import MetricsLogger


class SegTask(NamedTuple):
    """Everything experiment-specific the shared loop needs.

    ``apply`` signature: (params, batch_stats, x, rng, train) ->
    (logits, new_batch_stats). For folded heads (TEDM) logits has leading
    dim fold*B; labels/valid are repeated inside the loop.
    """

    apply: Callable[..., Tuple[Array, Any]]
    params: Any
    batch_stats: Any
    fold: int = 1
    # Names of per-fold timesteps for per-timestep loss logging (TEDM).
    fold_names: Tuple[int, ...] = ()


def masked_bce_per_image(logits: Array, labels: Array, valid: Array) -> Tuple[Array, Array]:
    """Per-image BCE (mean over pixels/channels) and the masked scalar mean.
    Matches reduce('b c h w -> b c', 'mean').mean() with padding excluded."""
    per_px = M.bce_with_logits(logits.astype(jnp.float32), labels.astype(jnp.float32))
    per_img = per_px.reshape(per_px.shape[0], -1).mean(axis=1)
    denom = jnp.maximum(valid.sum(), 1.0)
    return per_img, (per_img * valid).sum() / denom


def make_train_step(task: SegTask, tx: optax.GradientTransformation,
                    freeze_mask: Any = None, unfreeze_at: int = 0):
    """``freeze_mask`` (a 0/1 pytree matching params) zeroes gradients of
    frozen subtrees until ``step_idx >= unfreeze_at`` — the CL finetune
    freeze (reference: finetune_glob_cl.py:64-67,139-146) as a traced
    switch inside the ONE shared compiled step."""

    def loss_fn(params, batch_stats, x, y, valid, rng):
        logits, new_bs = task.apply(params, batch_stats, x, rng, True)
        if task.fold > 1:
            y = jnp.tile(y, (task.fold, 1, 1, 1))
            valid = jnp.tile(valid, (task.fold,))
        per_img, loss = masked_bce_per_image(logits, y, valid)
        return loss, (new_bs, per_img)

    @partial(jax.jit, donate_argnums=(0, 2))
    def step(params, batch_stats, opt_state, x, y, valid, rng, step_idx):
        (loss, (new_bs, per_img)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats, x, y, valid, rng)
        if freeze_mask is not None:
            unfrozen = step_idx >= unfreeze_at
            live = jax.tree_util.tree_map(
                lambda m: jnp.where(unfrozen, 1.0, m), freeze_mask
            )
            grads = jax.tree_util.tree_map(jnp.multiply, grads, live)
            updates, opt_state = tx.update(grads, opt_state, params)
            # Mask the UPDATES too: adamw's decoupled weight decay is added
            # in tx.update regardless of the gradient, so zeroed grads alone
            # would still shrink "frozen" params by lr*wd per step. The
            # reference freeze (requires_grad=False) keeps them bit-identical.
            updates = jax.tree_util.tree_map(jnp.multiply, updates, live)
        else:
            updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # per-fold masked mean loss (TEDM per-timestep logging,
        # reference: train_baseline.py:56-58,70-73); padding rows excluded
        w = valid.astype(jnp.float32)
        per_fold = (per_img.reshape(task.fold, -1) * w).sum(axis=1) / jnp.maximum(
            w.sum(), 1.0
        )
        return params, new_bs, opt_state, loss, per_fold

    return step


def make_eval_step(task: SegTask):
    @jax.jit
    def step(params, batch_stats, x, y, valid, rng):
        logits, _ = task.apply(params, batch_stats, x, rng, False)
        if task.fold > 1:
            y = jnp.tile(y, (task.fold, 1, 1, 1))
            valid = jnp.tile(valid, (task.fold,))
        per_img, loss = masked_bce_per_image(logits, y, valid)
        y_hat = jax.nn.sigmoid(logits.astype(jnp.float32)) > 0.5
        vmask = jnp.where(valid > 0, 1.0, jnp.nan)[:, None]
        d = M.dice(y_hat, y) * vmask
        p = M.precision(y_hat, y) * vmask
        r = M.recall(y_hat, y) * vmask
        return loss, d, p, r, logits

    return step


def validate(
    config: Config,
    task: SegTask,
    params,
    batch_stats,
    loader,
    rng: Array,
    return_preds: bool = False,
    eval_step=None,
) -> Dict[str, Any]:
    """Reference validate (trainers/train_baseline.py:99-144): metrics with
    nanmean over images; padding rows become NaN and drop out.

    Pass a prebuilt ``eval_step`` from the training loop — building it here
    creates a fresh closure whose jit cache misses every call."""
    if eval_step is None:
        eval_step = make_eval_step(task)
    losses, weights, dices, precs, recs, preds = [], [], [], [], [], []
    for i, batch in enumerate(loader):
        rng, sub = jax.random.split(rng)
        loss, d, p, r, logits = eval_step(
            params, batch_stats, batch["image"], batch["mask"], batch["valid"], sub
        )
        w = float(batch["valid"].sum())
        losses.append(float(loss) * w)
        weights.append(w)
        dices.append(np.asarray(d))
        precs.append(np.asarray(p))
        recs.append(np.asarray(r))
        if return_preds:
            preds.append(np.asarray(jax.nn.sigmoid(logits.astype(jnp.float32))))
        if i + 1 == config.max_val_steps or config.debug:
            break
    out = {
        "val/loss": float(np.sum(losses) / max(np.sum(weights), 1e-9)),
        "val/dice": float(np.nanmean(np.concatenate(dices))),
        "val/precision": float(np.nanmean(np.concatenate(precs))),
        "val/recall": float(np.nanmean(np.concatenate(recs))),
    }
    if return_preds:
        out["predictions"] = preds
        out["per_image"] = {
            "dice": np.concatenate(dices),
            "precision": np.concatenate(precs),
            "recall": np.concatenate(recs),
        }
    return out


def train_segmentation(
    config: Config,
    task: SegTask,
    loaders: Dict[str, Any],
    logger: MetricsLogger,
    start_step: int = 0,
    extra_ckpt_state: Optional[Dict[str, Any]] = None,
    freeze_mask: Any = None,
    unfreeze_at: int = 0,
) -> Tuple[Any, Any]:
    """The shared loop. Returns (params, batch_stats) at the end."""
    tx = optax.adamw(config.lr, weight_decay=config.weight_decay) if config.weight_decay else optax.adam(config.lr)
    params, batch_stats = task.params, task.batch_stats
    opt_state = tx.init(params)
    train_step = make_train_step(task, tx, freeze_mask, unfreeze_at)
    eval_step = make_eval_step(task)  # built ONCE; re-jitting per validation
                                      # would recompile every val_freq steps

    # Warm restart (reference: --resume_path, config.py:16; the reference's
    # supervised trainers lacked this — its finetune/local_cl load() raise
    # NotImplementedError, SURVEY §5).
    if config.resume_path:
        from tedm_tpu.utils.checkpoint import checkpoint_exists, load_checkpoint

        if checkpoint_exists(config.resume_path):
            template = {"params": params, "batch_stats": batch_stats,
                        "opt_state": opt_state, "step": 0,
                        **(extra_ckpt_state or {})}
            restored, _ = load_checkpoint(config.resume_path, template, config)
            params = restored["params"]
            batch_stats = restored["batch_stats"]
            opt_state = restored["opt_state"]
            start_step = int(restored["step"])
            print(f"Resumed from {config.resume_path} at step {start_step}")

    from tedm_tpu.parallel import data_parallel_setup

    shard, replicate = data_parallel_setup(config, loaders["train"].batch_size)
    params = replicate(params)
    batch_stats = replicate(batch_stats)
    opt_state = replicate(opt_state)

    rng = jax.random.PRNGKey(config.seed)
    best_val_loss = float("inf")
    train_losses: List[float] = []
    fold_losses: List[np.ndarray] = []
    step = start_step
    t0 = time.time()
    imgs_seen = 0

    from tedm_tpu.utils.interrupt import graceful_shutdown

    def make_state():
        return {
            "params": params,
            "batch_stats": batch_stats,
            "opt_state": opt_state,
            "step": step,
            **(extra_ckpt_state or {}),
        }

    with graceful_shutdown() as should_stop:
        for batch in loaders["train"].repeat():
            step += 1
            rng, sub = jax.random.split(rng)
            if config.profile_dir and step == 10:
                jax.profiler.start_trace(config.profile_dir)
            b = shard({"image": batch["image"], "mask": batch["mask"],
                       "valid": batch["valid"]})
            params, batch_stats, opt_state, loss, per_fold = train_step(
                params, batch_stats, opt_state,
                b["image"], b["mask"], b["valid"], sub, jnp.int32(step),
            )
            if config.profile_dir and step == 15:
                jax.block_until_ready(loss)
                jax.profiler.stop_trace()
            # keep device scalars: a float()/np.asarray() here would block
            # on the step result every iteration (one host<->device round
            # trip per step; JAX's async dispatch only pays off if the
            # host never syncs inside the hot loop)
            train_losses.append(loss)
            fold_losses.append(per_fold)
            imgs_seen += int(batch["valid"].sum())

            if step % config.log_freq == 0 or config.debug:
                # Sync on the window's losses BEFORE reading the clock —
                # dt must cover the actual execution of every step in the
                # window, not just their async dispatch (see
                # trainers/diffusion.py for the measured failure mode).
                # One batched device_get for the whole window (a float()
                # per element is one tunnel round trip each).
                window_loss = float(np.mean(jax.device_get(train_losses)))
                dt = time.time() - t0
                logs = {
                    "train/loss": window_loss,
                    "train/imgs_per_sec": imgs_seen / max(dt, 1e-9),
                }
                if task.fold > 1 and task.fold_names:
                    mean_fold = np.mean(np.stack([np.asarray(f) for f in fold_losses]), axis=0)
                    for name, v in zip(task.fold_names, mean_fold):
                        logs[f"train_loss/step_{name}"] = float(v)
                logger.log(logs, step)
                train_losses, fold_losses = [], []
                t0, imgs_seen = time.time(), 0

            if step % config.val_freq == 0 or config.debug:
                rng, vrng = jax.random.split(rng)
                val = validate(config, task, params, batch_stats,
                               loaders["val"], vrng, eval_step=eval_step)
                logger.log(val, step)
                if val["val/loss"] < best_val_loss and not config.debug:
                    best_val_loss = val["val/loss"]
                    save_checkpoint(f"{config.log_dir}/best", make_state(), config)
                elif val["val/loss"] > best_val_loss * 1.5 and config.early_stop:
                    return params, batch_stats

            # periodic checkpoints on their OWN cadence (a nested check
            # under val_freq silently skipped every step not divisible by
            # both frequencies)
            if config.ckpt_every and step % config.ckpt_every == 0:
                save_checkpoint(
                    f"{config.log_dir}/step_{step}", make_state(), config
                )

            if should_stop():
                # SIGTERM/SIGINT: save a resumable state and exit cleanly
                save_checkpoint(f"{config.log_dir}/interrupted", make_state(), config)
                print(f"[interrupt] saved {config.log_dir}/interrupted at "
                      f"step {step}")
                return params, batch_stats

            if step >= config.max_steps or config.debug:
                return params, batch_stats
