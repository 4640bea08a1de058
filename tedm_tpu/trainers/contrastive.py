"""Contrastive-learning suite: global_cl, local_cl, and the finetunes.

Reference: trainers/train_global_cl.py (SimCLR NT-Xent on CXR14),
trainers/train_local_cl.py (region-contrastive on the first 2 decoder
stages, ONLY ups[:2] trainable — even g2 stays frozen at its random init,
train_local_cl.py:183-192, mirrored exactly), and
trainers/finetune_glob_cl.py / finetune_glob_loc_cl.py (supervised JSRT
finetune of the pretrained encoder; downs/init_conv/mid frozen until
``unfreeze_weights_at_step``; optional crop+brightness/contrast
augmentation keyed on ``augment_at_finetuning``).

TPU-native: augmentations are vmapped affine resamples inside the jitted
step (no per-sample Python loops); partial freezing is a gradient mask
(zero the frozen subtrees; for the finetune's step-triggered unfreeze the
mask flips via jnp.where on the step counter, so there is exactly ONE
compiled step function)."""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tedm_tpu.config import Config
from tedm_tpu.data import build_dataloaders
from tedm_tpu.models.contrastive import (
    GlobalCL,
    LocalCL,
    global_nt_xent,
    local_region_loss,
)
from tedm_tpu.models.unet import Unet
from tedm_tpu.ops.augment import augment_and_concat, brightness_contrast, crop_batch
from tedm_tpu.trainers.common import SegTask, train_segmentation
from tedm_tpu.utils.checkpoint import (
    checkpoint_exists,
    load_checkpoint,
    load_config,
    save_checkpoint,
)
from tedm_tpu.utils.logging import MetricsLogger

FROZEN_PREFIXES = ("downs", "init_conv", "mid_")  # reference: finetune_glob_cl.py:64-67


def _deep_merge(dst: Any, src: Any) -> Any:
    """Recursively overlay ``src`` onto ``dst``, keeping ``dst`` keys that
    ``src`` lacks. The CL models initialize their unet subtree lazily (no
    decoder / no FiLM time_proj params), so a top-level dict replace would
    silently DROP those params from the finetuned model and produce
    checkpoints that no longer restore against a full-UNet template."""
    if isinstance(dst, dict) and isinstance(src, dict):
        out = dict(dst)
        for k, v in src.items():
            out[k] = _deep_merge(dst[k], v) if k in dst else v
        return out
    return src


def _grad_mask(params: Any, keep: Callable[[str], bool]) -> Any:
    """{top-level key -> 0/1} mask pytree for gradient gating."""
    return {
        k: jax.tree_util.tree_map(lambda _: jnp.float32(1.0 if keep(k) else 0.0), v)
        for k, v in params.items()
    }


def _train_cl(config: Config, model, variables, loss_of, grad_mask=None) -> None:
    """Shared CL loop (reference train/validate shape,
    train_global_cl.py:71-137): unlabeled CXR14 batches, two augmented
    views, feature loss, best-val checkpointing.

    Framework-grade like the supervised loop (trainers/common.py): DP over
    the mesh 'data' axis, ``--resume_path`` warm restart, periodic
    ``ckpt_every`` checkpoints on their own cadence, and SIGTERM/SIGINT
    graceful shutdown with a resumable ``interrupted`` checkpoint — all
    absent in the reference CL trainers (its local_cl/finetune ``load()``
    even ``raise NotImplementedError``, SURVEY §5)."""
    tx = optax.adam(config.lr)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)

    def loss_fn(p, bs, x, rng, train):
        k_aug, k_loss = jax.random.split(rng)
        views = augment_and_concat(k_aug, x)
        return loss_of(p, bs, views, k_loss, train)

    @partial(jax.jit, donate_argnums=(0, 2))
    def train_step(p, bs, opt_state, x, rng):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, bs, x, rng, True
        )
        if grad_mask is not None:
            grads = jax.tree_util.tree_map(jnp.multiply, grads, grad_mask)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), new_bs, opt_state, loss

    @jax.jit
    def eval_step(p, bs, x, rng):
        # eval mode: BatchNorm running stats, no stat updates (the
        # reference validate() calls model.eval(), train_local_cl.py)
        loss, _ = loss_fn(p, bs, x, rng, False)
        return loss

    # drop_last: a padded final batch would feed all-zero rows into the
    # contrastive losses as if they were real images (the zero embeddings
    # act as spurious positives/negatives). The reference's DataLoader just
    # produced a smaller final batch; with the static-shape contract the
    # equivalent is to drop it.
    loaders = build_dataloaders(
        "CXR14", config.data_dir, config.img_size, config.batch_size,
        config.num_workers, seed=config.seed,
        shard_index=jax.process_index(), shard_count=jax.process_count(),
        synthetic=config.synthetic_data, drop_last=True,
        backend=config.data_backend, splits_dir=config.splits_dir,
    )
    logger = MetricsLogger(config.log_dir, config, enabled=not config.debug)

    step = 0
    if config.resume_path and checkpoint_exists(config.resume_path):
        template = {"params": params, "batch_stats": batch_stats,
                    "opt_state": opt_state, "step": 0}
        restored, _ = load_checkpoint(config.resume_path, template, config)
        params = restored["params"]
        batch_stats = restored["batch_stats"]
        opt_state = restored["opt_state"]
        step = int(restored["step"])
        print(f"Resumed from {config.resume_path} at step {step}")

    from tedm_tpu.parallel import data_parallel_setup
    from tedm_tpu.utils.interrupt import graceful_shutdown

    shard, replicate = data_parallel_setup(config, loaders["train"].batch_size)
    params = replicate(params)
    batch_stats = replicate(batch_stats)
    opt_state = replicate(opt_state)
    if grad_mask is not None:
        grad_mask = replicate(grad_mask)

    rng = jax.random.PRNGKey(config.seed)
    best_val = float("inf")
    train_losses = []
    t0 = time.time()

    def make_state():
        return {"params": params, "batch_stats": batch_stats,
                "opt_state": opt_state, "step": step}

    with graceful_shutdown() as should_stop:
        for batch in loaders["train"].repeat():
            step += 1
            rng, sub = jax.random.split(rng)
            x = shard({"image": batch["image"]})["image"]
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, x, sub
            )
            train_losses.append(loss)  # device scalar: no per-step host sync

            if step % config.log_freq == 0 or config.debug:
                logger.log({"train/loss": float(np.mean(jax.device_get(train_losses)))}, step)
                train_losses = []

            if step % config.val_freq == 0 or config.debug:
                vloss, n = 0.0, 0
                for i, vb in enumerate(loaders["val"]):
                    rng, vk = jax.random.split(rng)
                    vx = shard({"image": vb["image"]})["image"]
                    vloss += float(eval_step(params, batch_stats, vx, vk))
                    n += 1
                    if i + 1 == config.max_val_steps or config.debug:
                        break
                vloss /= max(n, 1)
                logger.log({"val/loss": vloss}, step)
                if vloss < best_val and not config.debug:
                    best_val = vloss
                    save_checkpoint(f"{config.log_dir}/best", make_state(), config)

            if config.ckpt_every and step % config.ckpt_every == 0:
                save_checkpoint(f"{config.log_dir}/step_{step}", make_state(), config)

            if should_stop():
                save_checkpoint(f"{config.log_dir}/interrupted", make_state(), config)
                print(f"[interrupt] saved {config.log_dir}/interrupted at "
                      f"step {step}")
                break

            if step >= config.max_steps or config.debug:
                break
    logger.close()


def main_global(config: Config) -> None:
    model = GlobalCL(
        img_size=config.img_size, dim=config.dim, dim_mults=tuple(config.dim_mults),
        channels=config.channels,
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
    )
    variables = model.init(
        jax.random.PRNGKey(config.seed),
        jnp.zeros((2, config.img_size, config.img_size, config.channels)),
    )
    def loss_of(p, bs, views, rng, train):
        feats = model.apply({"params": p}, views)
        return global_nt_xent(feats, views.shape[0] // 2, config.tau), bs

    _train_cl(config, model, dict(variables), loss_of)


def main_local(config: Config) -> None:
    model = LocalCL(
        img_size=config.img_size, dim=config.dim, dim_mults=tuple(config.dim_mults),
        channels=config.channels,
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
    )
    variables = dict(model.init(
        jax.random.PRNGKey(config.seed),
        jnp.zeros((2, config.img_size, config.img_size, config.channels)),
        train=False,
    ))
    # Warm-start the backbone from the GlobalCL checkpoint (strict=False
    # analogue: copy the 'unet' subtree; heads stay at init).
    if config.global_model_path and checkpoint_exists(config.global_model_path):
        gp = _load_unet_subtree(config, config.global_model_path)
        # strict=False analogue: GlobalCL's unet subtree only has encoder+mid
        # params (flax init is lazy); deep-merge what exists, keep our init
        # for the rest (decoder stays random, as the reference notes).
        variables["params"] = {
            **variables["params"],
            "unet": _deep_merge(variables["params"]["unet"], gp),
        }
        print(f"Loaded GlobalCL backbone from {config.global_model_path}")

    # ONLY ups[:l] trains (reference: train_local_cl.py:183-192).
    def keep_unet(k: str) -> bool:
        return any(k.startswith(f"ups_{i}_") for i in range(model.l))

    mask = {
        k: (_grad_mask(v, keep_unet) if k == "unet"
            else jax.tree_util.tree_map(lambda _: jnp.float32(0.0), v))
        for k, v in variables["params"].items()
    }

    def loss_of(p, bs, views, rng, train):
        if train:
            feats, upd = model.apply(
                {"params": p, "batch_stats": bs}, views, train=True,
                mutable=["batch_stats"],
            )
            new_bs = upd["batch_stats"]
        else:
            feats = model.apply({"params": p, "batch_stats": bs}, views, train=False)
            new_bs = bs
        return (
            local_region_loss(rng, feats, views.shape[0] // 2, config.tau),
            new_bs,
        )

    _train_cl(config, model, variables, loss_of, grad_mask=mask)


def _load_unet_subtree(config: Config, path: str) -> Any:
    """Restore just the 'unet' params subtree from a GlobalCL/LocalCL
    checkpoint by rebuilding the saving model's template."""
    old = load_config(path)
    cls = GlobalCL if old.experiment == "global_cl" else LocalCL
    model = cls(
        img_size=old.img_size, dim=old.dim, dim_mults=tuple(old.dim_mults),
        channels=old.channels,
    )
    kw = {} if cls is GlobalCL else {"train": False}
    template = dict(model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, old.img_size, old.img_size, old.channels)),
        **kw,
    ))
    tx_template = optax.adam(old.lr).init(template["params"])
    state, _ = load_checkpoint(
        path,
        {"params": template["params"],
         "batch_stats": template.get("batch_stats", {}),
         "opt_state": tx_template, "step": 0},
        config,
    )
    return state["params"]["unet"]


def main_finetune(config: Config) -> None:
    """global_finetune / glob_loc_finetune: supervised JSRT training of a
    Unet warm-started from the CL checkpoint (reference:
    finetune_glob_cl.py:117-171), via the shared supervised loop with a
    step-gated gradient mask and optional augmentation."""
    dtype = jnp.bfloat16 if config.mixed_precision else jnp.float32
    unet = Unet(
        dim=config.dim, dim_mults=tuple(config.dim_mults), channels=config.channels,
        out_dim=config.out_channels, dtype=dtype,
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
    )
    rng = jax.random.PRNGKey(config.seed)
    params = unet.init(
        rng,
        jnp.zeros((1, config.img_size, config.img_size, config.channels)),
        jnp.zeros((1,), jnp.int32),
    )["params"]

    ckpt_path = (
        config.glob_loc_model_path
        if config.experiment == "glob_loc_finetune" and config.glob_loc_model_path
        else config.global_model_path
    )
    if ckpt_path and checkpoint_exists(ckpt_path):
        pre = _load_unet_subtree(config, ckpt_path)
        # strict=False analogue: deep-merge so modules the CL model never
        # initialized (FiLM time_proj, decoder) keep our fresh init.
        params = _deep_merge(params, pre)
        print(f"Loaded pretrained encoder from {ckpt_path} "
              "(note: decoder values come from the CL init, as in the reference)")

    frozen = {
        k: any(k.startswith(pfx) for pfx in FROZEN_PREFIXES) for k in params
    }

    step_counter = {"step": 0}

    def apply(p, aux, x, rng, train):
        logits = unet.apply({"params": p}, x, None)
        return logits.astype(jnp.float32), aux

    task = SegTask(apply=apply, params=params, batch_stats={})

    loaders = build_dataloaders(
        "JSRT", config.data_dir, config.img_size, config.batch_size,
        config.num_workers, config.n_labelled_images, seed=config.seed,
        shard_index=jax.process_index(), shard_count=jax.process_count(),
        synthetic=config.synthetic_data, backend=config.data_backend,
        splits_dir=config.splits_dir,
    )
    if config.augment_at_finetuning:
        loaders = dict(loaders)
        loaders["train"] = _AugmentedLoader(loaders["train"], config.seed)

    logger = MetricsLogger(config.log_dir, config, enabled=not config.debug)
    if config.unfreeze_weights_at_step > 0:
        # Step-gated freeze runs through the SAME shared loop (one compiled
        # step with a traced unfreeze switch) so resume/ckpt_every/early-
        # stop/interrupt/DP and the optimizer choice (adamw under
        # weight_decay — what eval's restore template rebuilds) all behave
        # identically to every other supervised trainer.
        freeze_mask = {
            k: jax.tree_util.tree_map(
                lambda _: jnp.float32(0.0 if frozen[k] else 1.0), v
            )
            for k, v in params.items()
        }
        train_segmentation(
            config, task, loaders, logger,
            freeze_mask=freeze_mask,
            unfreeze_at=config.unfreeze_weights_at_step,
        )
    else:
        train_segmentation(config, task, loaders, logger)
    logger.close()


class _AugmentedLoader:
    """Wraps a Loader: applies crop+brightness/contrast to (image, mask)
    pairs on host via jitted ops (reference: finetune_glob_cl.py:30-34)."""

    def __init__(self, loader, seed: int):
        self.loader = loader
        self._rng = jax.random.PRNGKey(seed + 12345)

    def __getattr__(self, name):
        # delegate Loader attributes (batch_size, indices, ...) so the
        # shared loop's DP setup and logging see the wrapped loader
        return getattr(self.loader, name)

    def __iter__(self):
        for b in self.loader:
            self._rng, k1, k2 = jax.random.split(self._rng, 3)
            img, mask = crop_batch(k1, jnp.asarray(b["image"]), jnp.asarray(b["mask"]))
            img = brightness_contrast(k2, img)
            yield {**b, "image": np.asarray(img), "mask": np.asarray(mask)}

    def repeat(self):
        while True:
            yield from self


