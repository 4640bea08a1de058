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


def mode_channels(config: Config) -> Tuple[int, int]:
    """(x_channels, model_input_channels) per experiment mode
    (reference: trainers/train_base_diffusion.py:26-32):
    img_only — unconditional on images; joint — DDPM over cat(img, seg);
    conditional — DDPM over seg with the image concatenated to every
    model input (real conditioning; the reference's ``cond`` was ignored,
    models/unet_model.py:333)."""
    if config.experiment == "joint":
        return 2, 2
    if config.experiment in ("conditional", "joint_and_cond"):
        return 1, 2
    return config.channels, config.channels


def build_model(config: Config) -> Unet:
    dtype = jnp.bfloat16 if config.mixed_precision else jnp.float32
    x_ch, _ = mode_channels(config)
    return Unet(
        dim=config.dim,
        dim_mults=tuple(config.dim_mults),
        channels=x_ch,
        out_dim=x_ch,
        dtype=dtype,
        use_pallas=config.use_pallas and jax.default_backend() == "tpu",
        use_pallas_groupnorm=(
            config.use_pallas_groupnorm and jax.default_backend() == "tpu"
        ),
        use_pallas_resblock=(
            config.use_pallas_resblock and jax.default_backend() == "tpu"
        ),
        use_pallas_flash=(
            config.use_pallas_flash and jax.default_backend() == "tpu"
        ),
        attn_layout=config.attn_layout,
        remat=config.remat,
    )


def init_params(config: Config, unet: Unet, rng) -> Any:
    _, in_ch = mode_channels(config)
    return unet.init(
        rng,
        jnp.zeros((1, config.img_size, config.img_size, in_ch)),
        jnp.zeros((1,), jnp.int32),
    )["params"]


def make_steps(config: Config, unet: Unet, sched, tx):
    conditional = config.experiment in ("conditional", "joint_and_cond")
    x_ch, _ = mode_channels(config)

    def apply_fn_of(params, cond=None):
        if conditional:
            def apply(x, t, **kw):
                # val_loss folds timesteps into the batch axis; tile the
                # conditioning image to match.
                c = jnp.tile(cond, (x.shape[0] // cond.shape[0], 1, 1, 1))
                return unet.apply(
                    {"params": params}, jnp.concatenate([x, c], axis=-1), t, **kw
                )
        else:
            def apply(x, t, **kw):
                return unet.apply({"params": params}, x, t, **kw)
        # --remat is implemented INSIDE the Unet (block-level nn.remat,
        # see Unet.remat): the backward recomputes one block at a time so
        # only block-boundary activations stay resident. A whole-model
        # jax.checkpoint here would NOT cut peak memory — the
        # rematerialized forward holds the full activation set again
        # (measured: 512² batch-4 OOMs that way; docs/DESIGN.md).
        return apply

    # joint x has (img, seg) channels: log the split per the reference's
    # intended train_loss/img + train_loss/seg (train_base_diffusion.py:58-62)
    split_channels = x_ch > 1

    def loss_fn(params, x, cond, valid, rng):
        out = train_loss(
            apply_fn_of(params, cond), sched, rng, x,
            objective=config.objective, normalize=config.normalize, valid=valid,
            aux_channel_losses=split_channels,
        )
        if split_channels:
            return out[0], out[1]
        return out, jnp.zeros((1,), jnp.float32)

    ema_decay = float(config.ema_decay)
    accum = int(config.grad_accum)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    ch_width = x_ch if split_channels else 1

    def grads_and_metrics(params, x, cond, valid, rng):
        """(grads, loss, ch_losses) for the global batch.

        ``--grad_accum N`` scans N microbatches inside the SAME jitted
        step, so only one microbatch's activations are ever live (~1/N
        activation memory at the same global batch; composes with --remat
        and every sharding mode — the microbatch axis is a static reshape,
        so GSPMD keeps the 'data' sharding on each slice). Each microbatch
        loss is the masked mean over ITS valid rows; re-weighting by the
        per-microbatch valid count makes the accumulated loss and grads
        exactly the global masked mean (up to float reassociation) — the
        identity tests/test_grad_accum.py pins. RNG is folded per
        microbatch so t/noise draws stay independent across the batch."""
        if accum <= 1:
            (loss, ch_losses), grads = grad_fn(params, x, cond, valid, rng)
            return grads, loss, ch_losses
        mb = x.shape[0] // accum
        xs = x.reshape((accum, mb) + x.shape[1:])
        vs = valid.astype(jnp.float32).reshape(accum, mb)
        cs = (
            cond.reshape((accum, mb) + cond.shape[1:])
            if conditional
            else jnp.broadcast_to(cond, (accum,) + cond.shape)
        )

        def body(carry, inp):
            g_sum, l_sum, ch_sum, d_sum = carry
            x_i, c_i, v_i, i = inp
            (loss_i, ch_i), g_i = grad_fn(
                params, x_i, c_i, v_i, jax.random.fold_in(rng, i)
            )
            # w_i is the microbatch's own masked-mean denominator
            # (max(valid.sum(), 1) in train_loss): loss_i * w_i recovers the
            # un-normalized per-row sum, so Σ w_i·loss_i / Σ valid is the
            # global masked mean exactly (an all-padding microbatch
            # contributes 0 either way).
            w_i = jnp.maximum(v_i.sum(), 1.0)
            g_sum = jax.tree_util.tree_map(lambda a, g: a + w_i * g, g_sum, g_i)
            return (g_sum, l_sum + w_i * loss_i, ch_sum + w_i * ch_i,
                    d_sum + v_i.sum()), None

        init = (
            jax.tree_util.tree_map(jnp.zeros_like, params),
            jnp.zeros((), jnp.float32),
            jnp.zeros((ch_width,), jnp.float32),
            jnp.zeros((), jnp.float32),
        )
        (g_sum, l_sum, ch_sum, d_sum), _ = jax.lax.scan(
            body, init, (xs, cs, vs, jnp.arange(accum))
        )
        denom = jnp.maximum(d_sum, 1.0)
        grads = jax.tree_util.tree_map(lambda g: g / denom, g_sum)
        return grads, l_sum / denom, ch_sum / denom

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, x, cond, valid, rng):
        grads, loss, ch_losses = grads_and_metrics(params, x, cond, valid, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, ch_losses

    # EMA variant: the average update rides inside the SAME jitted step
    # (one fused lerp over the param pytree — ~param-bytes of extra HBM
    # traffic, <1% of the 55 GB/step measured in ROOFLINE.json; a separate
    # jit would pay an extra dispatch per step through the axon tunnel).
    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step_ema(params, opt_state, ema_params, x, cond, valid, rng):
        grads, loss, ch_losses = grads_and_metrics(params, x, cond, valid, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema_params = jax.tree_util.tree_map(
            lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
            ema_params, params,
        )
        return params, opt_state, ema_params, loss, ch_losses

    @jax.jit
    def eval_step(params, x, cond, valid, rng):
        return val_loss(
            apply_fn_of(params, cond), sched, rng, x, config.val_steps,
            objective=config.objective, normalize=config.normalize,
            valid=valid,
        )

    @partial(jax.jit, static_argnums=(3,))
    def sample_grid(params, cond, rng, n):
        x0, snaps = sample_loop_with_snapshots(
            apply_fn_of(params, cond), sched, rng,
            (1, config.img_size, config.img_size, x_ch),
            n_snapshots=n,
            objective=config.objective,
            dynamic_threshold_percentile=config.dynamic_threshold_percentile,
        )
        # joint sampling produces (img, seg) channel pairs; tile channels
        # side by side for the grid.
        snaps = snaps[:, 0]
        if snaps.shape[-1] > 1:
            snaps = jnp.concatenate(
                [snaps[..., c : c + 1] for c in range(snaps.shape[-1])], axis=2
            )
        return unnormalize_to_zero_to_one(jnp.clip(snaps, -1.0, 1.0))

    if ema_decay > 0.0:
        return train_step_ema, eval_step, sample_grid
    return train_step, eval_step, sample_grid


def batch_to_x_cond(config: Config, batch) -> Tuple[np.ndarray, np.ndarray]:
    """Per-mode (x_0, cond): img_only -> (image, dummy); joint ->
    (cat(image, mask), dummy); conditional -> (mask, image in [-1, 1]);
    joint_and_cond -> (image, mask in [-1, 1]) — the reference's
    ``cond = y`` branch (train_base_diffusion.py:31-32), with the
    conditioning actually consumed."""
    img = batch["image"]
    if config.experiment == "joint":
        return np.concatenate([img, batch["mask"]], axis=-1), np.zeros((1,), np.float32)
    if config.experiment == "conditional":
        return batch["mask"], img.astype(np.float32) * 2.0 - 1.0
    if config.experiment == "joint_and_cond":
        return img, batch["mask"].astype(np.float32) * 2.0 - 1.0
    return img, np.zeros((1,), np.float32)


def validate(config, eval_step, sample_grid, params, loader, rng, logger, step):
    losses, weights = [], []
    cond0 = None
    for i, batch in enumerate(loader):
        rng, sub = jax.random.split(rng)
        x, cond = batch_to_x_cond(config, batch)
        # padded rows are masked inside val_loss (static shapes — slicing
        # the tail would force a second multi-minute UNet compile)
        w = float(batch["valid"].sum())
        if w == 0:
            continue
        if cond0 is None:
            cond0 = cond[:1] if cond.ndim > 1 else cond
        losses.append(float(eval_step(params, x, cond, batch["valid"], sub)) * w)
        weights.append(w)
        if i + 1 == config.max_val_steps or config.debug:
            break
    rng, srng = jax.random.split(rng)
    n_snaps = min(config.n_sampled_imgs, 10)
    snaps = sample_grid(params, cond0, srng, n_snaps)
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
    # Honor --weight_decay like the supervised loop (common.py) does; the
    # reference diffusion trainer is plain Adam, so the default (0.0) matches.
    tx = (optax.adamw(config.lr, weight_decay=config.weight_decay)
          if config.weight_decay else optax.adam(config.lr))
    params = init_params(config, unet, init_rng)
    opt_state = tx.init(params)
    step = 0

    use_ema = config.ema_decay > 0.0
    ema_params = None
    if config.resume_path and checkpoint_exists(config.resume_path):
        from tedm_tpu.utils.checkpoint import load_config

        # the checkpoint's own config decides whether an ema_params subtree
        # exists in the saved state (load_checkpoint restores into the
        # template's structure, so the template must match what was saved)
        old = load_config(config.resume_path)
        state = {"params": params, "opt_state": opt_state, "step": 0}
        if old.ema_decay > 0.0:
            state["ema_params"] = params
        state, _ = load_checkpoint(config.resume_path, state, config)
        params, opt_state, step = state["params"], state["opt_state"], int(state["step"])
        ema_params = state.get("ema_params")
        print(f"Resumed from {config.resume_path} at step {step}")

    if config.experiment in ("joint", "conditional", "joint_and_cond"):
        dataset = "JSRT"  # needs masks (reference: train_base_diffusion.py:26-32)
    elif config.experiment == "img_only":
        dataset = "CXR14"
    else:
        dataset = config.dataset
    loaders = build_dataloaders(
        dataset, config.data_dir, config.img_size, config.batch_size,
        config.num_workers, seed=config.seed,
        shard_index=jax.process_index(), shard_count=jax.process_count(),
        synthetic=config.synthetic_data, backend=config.data_backend,
        splits_dir=config.splits_dir,
    )
    logger = MetricsLogger(config.log_dir, config, enabled=not config.debug)
    train_step, eval_step, sample_grid = make_steps(config, unet, sched, tx)

    # DP over the mesh: params replicated, batches sharded on 'data'
    # (GSPMD inserts the gradient psum over ICI).
    from tedm_tpu.parallel import data_parallel_setup

    shard, replicate = data_parallel_setup(config, loaders["train"].batch_size)
    params, opt_state = replicate(params), replicate(opt_state)
    if use_ema:
        # fresh copy (not an alias): both pytrees are donated to the jitted
        # step, and at step 1 ema must start exactly at the live params
        # (a resumed ema subtree is used as-is)
        ema_params = (replicate(ema_params) if ema_params is not None
                      else jax.tree_util.tree_map(jnp.copy, params))
    else:
        ema_params = None

    from tedm_tpu.utils.interrupt import graceful_shutdown

    best_val_loss = float("inf")
    train_losses = []
    channel_losses = []
    t0, imgs = time.time(), 0
    with graceful_shutdown() as should_stop:
        for batch in loaders["train"].repeat():
            step += 1
            rng, sub = jax.random.split(rng)
            if config.profile_dir and step == 10:
                jax.profiler.start_trace(config.profile_dir)
            x, cond = batch_to_x_cond(config, batch)
            sharded = shard({"x": x, "cond": cond, "valid": batch["valid"]})
            if use_ema:
                params, opt_state, ema_params, loss, ch_losses = train_step(
                    params, opt_state, ema_params,
                    sharded["x"], sharded["cond"], sharded["valid"], sub
                )
            else:
                params, opt_state, loss, ch_losses = train_step(
                    params, opt_state, sharded["x"], sharded["cond"], sharded["valid"], sub
                )
            if config.profile_dir and step == 15:
                jax.block_until_ready(loss)
                jax.profiler.stop_trace()
            # device scalars only — float() here would sync the host to the
            # device every step (one tunnel round trip per step)
            train_losses.append(loss)
            if config.experiment == "joint":
                channel_losses.append(ch_losses)
            imgs += int(batch["valid"].sum())

            if step % config.log_freq == 0 or config.debug:
                # Materialize the window's losses BEFORE reading the clock:
                # the float() blocks until every step in the window has
                # actually executed. Reading dt first measured DISPATCH
                # rate, not execution — async dispatch runs far ahead of
                # the device, and the device time it excluded reappeared
                # in nobody's window (the axon tunnel trap, in-product).
                # One batched device_get for the whole window (a float()
                # per element is one tunnel round trip each).
                window_loss = float(np.mean(jax.device_get(train_losses)))
                dt = time.time() - t0
                metrics = {"train/loss": window_loss,
                           "train/imgs_per_sec": imgs / max(dt, 1e-9)}
                if channel_losses:
                    ch = np.mean([np.asarray(c) for c in channel_losses], axis=0)
                    metrics["train_loss/img"] = float(ch[0])
                    metrics["train_loss/seg"] = float(ch[1])
                    channel_losses = []
                logger.log(metrics, step)
                train_losses, t0, imgs = [], time.time(), 0

            def full_state():
                state = {"params": params, "opt_state": opt_state, "step": step}
                if use_ema:
                    state["ema_params"] = ema_params
                return state

            if step % config.val_freq == 0 or config.debug:
                rng, vrng = jax.random.split(rng)
                # validate (and sample the grid) with the EMA weights when
                # enabled — those are the weights downstream inference uses
                vloss = validate(
                    config, eval_step, sample_grid,
                    ema_params if use_ema else params,
                    loaders["val"], vrng, logger, step
                )
                logger.log({"val/loss": vloss}, step)
                if vloss < best_val_loss and not config.debug:
                    best_val_loss = vloss
                    save_checkpoint(f"{config.log_dir}/best", full_state(), config)

            # periodic checkpoints on their OWN cadence, independent of
            # validation boundaries
            if config.ckpt_every and step % config.ckpt_every == 0:
                save_checkpoint(
                    f"{config.log_dir}/step_{step}", full_state(), config,
                )

            if should_stop():
                save_checkpoint(
                    f"{config.log_dir}/interrupted", full_state(), config,
                )
                print(f"[interrupt] saved {config.log_dir}/interrupted at step {step}")
                break

            if step >= config.max_steps or config.debug:
                break
    logger.close()
