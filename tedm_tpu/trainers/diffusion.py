"""DDPM backbone training (the main compute job).

Reference: trainers/train_CXR14.py (unconditional DDPM on ~90k CXR14
images) and the undispatched trainers/train_base_diffusion.py JSRT
variant. Per step: uniform t, q_sample, UNet forward, per-pixel L1 to the
noise, p2 reweight, Adam (train_CXR14.py:16-60, diffusion_model.py:120-143).
Validation: mean loss over evenly-spaced timesteps + a sampled-image grid
(the reference's ``sample_plot_image`` with its 1000 sequential kernel
launches becomes one jitted ``lax.scan``; its ``normalized=`` kwarg crash,
train_CXR14.py:86, is fixed by construction).

TPU-native: ONE jitted train step (loss+grad+Adam) with the batch sharded
over the mesh 'data' axis; bf16 compute under ``mixed_precision`` (the
reference's GradScaler was broken — SURVEY §2.2); periodic checkpointing
via ``ckpt_every`` on top of the reference's best-val policy; resume from
``resume_path``.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tedm_tpu.config import Config
from tedm_tpu.data import build_dataloaders
from tedm_tpu.models.diffusion import (
    sample_loop_with_snapshots,
    train_loss,
    unnormalize_to_zero_to_one,
    val_loss,
)
from tedm_tpu.models.unet import Unet
from tedm_tpu.ops.schedules import make_schedule
from tedm_tpu.utils.checkpoint import (
    checkpoint_exists,
    load_checkpoint,
    save_checkpoint,
)
from tedm_tpu.utils.logging import MetricsLogger


def build_model(config: Config) -> Unet:
    dtype = jnp.bfloat16 if config.mixed_precision else jnp.float32
    return Unet(
        dim=config.dim,
        dim_mults=tuple(config.dim_mults),
        channels=config.channels,
        dtype=dtype,
        use_pallas=config.use_pallas and jax.default_backend() == "tpu",
    )


def init_params(config: Config, unet: Unet, rng) -> Any:
    return unet.init(
        rng,
        jnp.zeros((1, config.img_size, config.img_size, config.channels)),
        jnp.zeros((1,), jnp.int32),
    )["params"]


def make_steps(config: Config, unet: Unet, sched, tx):
    def apply_fn_of(params):
        return lambda x, t, **kw: unet.apply({"params": params}, x, t, **kw)

    def loss_fn(params, x, valid, rng):
        return train_loss(
            apply_fn_of(params), sched, rng, x,
            objective=config.objective, normalize=config.normalize, valid=valid,
        )

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, x, valid, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, valid, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_step(params, x, rng):
        return val_loss(
            apply_fn_of(params), sched, rng, x, config.val_steps,
            objective=config.objective, normalize=config.normalize,
        )

    @partial(jax.jit, static_argnums=(2,))
    def sample_grid(params, rng, n):
        x0, snaps = sample_loop_with_snapshots(
            apply_fn_of(params), sched, rng,
            (1, config.img_size, config.img_size, config.channels),
            n_snapshots=n,
            objective=config.objective,
            dynamic_threshold_percentile=config.dynamic_threshold_percentile,
        )
        return unnormalize_to_zero_to_one(jnp.clip(snaps[:, 0], -1.0, 1.0))

    return train_step, eval_step, sample_grid


def validate(config, eval_step, sample_grid, params, loader, rng, logger, step):
    losses, weights = [], []
    for i, batch in enumerate(loader):
        rng, sub = jax.random.split(rng)
        # Reference val loss ignores padding; weight by valid rows.
        w = float(batch["valid"].sum())
        if w < len(batch["valid"]):  # drop padded rows (static alternative: mask)
            x = batch["image"][: int(w)]
            if x.shape[0] == 0:
                continue
        else:
            x = batch["image"]
        losses.append(float(eval_step(params, x, sub)) * x.shape[0])
        weights.append(x.shape[0])
        if i + 1 == config.max_val_steps or config.debug:
            break
    rng, srng = jax.random.split(rng)
    n_snaps = min(config.n_sampled_imgs, 10)
    snaps = sample_grid(params, srng, n_snaps)
    logger.log_images("val/samples", np.asarray(snaps), step)
    vloss = float(np.sum(losses) / max(np.sum(weights), 1e-9))
    return vloss


def main(config: Config) -> None:
    rng = jax.random.PRNGKey(config.seed)
    rng, init_rng = jax.random.split(rng)
    unet = build_model(config)
    sched = make_schedule(
        config.timesteps, config.beta_schedule,
        config.p2_loss_weight_gamma, config.p2_loss_weight_k,
    )
    tx = optax.adam(config.lr)
    params = init_params(config, unet, init_rng)
    opt_state = tx.init(params)
    step = 0

    if config.resume_path and checkpoint_exists(config.resume_path):
        state = {"params": params, "opt_state": opt_state, "step": 0}
        state, _ = load_checkpoint(config.resume_path, state, config)
        params, opt_state, step = state["params"], state["opt_state"], int(state["step"])
        print(f"Resumed from {config.resume_path} at step {step}")

    dataset = "CXR14" if config.experiment == "img_only" else config.dataset
    loaders = build_dataloaders(
        dataset, config.data_dir, config.img_size, config.batch_size,
        config.num_workers, seed=config.seed,
        shard_index=jax.process_index(), shard_count=jax.process_count(),
        synthetic=config.synthetic_data,
    )
    logger = MetricsLogger(config.log_dir, config, enabled=not config.debug)
    train_step, eval_step, sample_grid = make_steps(config, unet, sched, tx)

    best_val_loss = float("inf")
    train_losses = []
    t0, imgs = time.time(), 0
    for batch in loaders["train"].repeat():
        step += 1
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = train_step(
            params, opt_state, batch["image"], batch["valid"], sub
        )
        train_losses.append(float(loss))
        imgs += int(batch["valid"].sum())

        if step % config.log_freq == 0 or config.debug:
            dt = time.time() - t0
            logger.log(
                {"train/loss": float(np.mean(train_losses)),
                 "train/imgs_per_sec": imgs / max(dt, 1e-9)},
                step,
            )
            train_losses, t0, imgs = [], time.time(), 0

        if step % config.val_freq == 0 or config.debug:
            rng, vrng = jax.random.split(rng)
            vloss = validate(
                config, eval_step, sample_grid, params, loaders["val"], vrng, logger, step
            )
            logger.log({"val/loss": vloss}, step)
            state = {"params": params, "opt_state": opt_state, "step": step}
            if vloss < best_val_loss and not config.debug:
                best_val_loss = vloss
                save_checkpoint(f"{config.log_dir}/best", state, config)
            if config.ckpt_every and step % config.ckpt_every == 0:
                save_checkpoint(f"{config.log_dir}/step_{step}", state, config)

        if step >= config.max_steps or config.debug:
            break
    logger.close()
