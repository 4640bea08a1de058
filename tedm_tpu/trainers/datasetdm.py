"""LEDM / LEDMe / TEDM: frozen-backbone feature classifier training.

Reference: trainers/train_datasetDM.py + models/datasetDM_model.py.
A frozen DDPM UNet provides decoder features at ``t_steps_to_save``;
a 1x1-conv MLP head is trained with BCE on few labeled JSRT images.
TEDM (``shared_weights_over_timesteps``) folds the timestep axis into the
batch so ONE head sees every timestep (train_datasetDM.py:30-42), with
labels repeated ×S in the shared loop.

TPU-native: extraction + classification run inside ONE jitted step —
features never touch the host (the reference round-trips every hooked
activation through CPU, datasetDM_model.py:27). The backbone params ride
in the task's aux state (not differentiated, not in the optimizer) and
gradients stop at the feature boundary, mirroring the reference's
``@torch.no_grad`` extraction + classifier-only Adam
(train_datasetDM.py:46).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from tedm_tpu.config import Config
from tedm_tpu.data import build_dataloaders
from tedm_tpu.models.segmentation import PixelClassifier, extract_features
from tedm_tpu.models.unet import Unet
from tedm_tpu.ops.schedules import make_schedule
from tedm_tpu.trainers.common import SegTask, train_segmentation
from tedm_tpu.utils.checkpoint import checkpoint_exists, load_checkpoint, load_config
from tedm_tpu.utils.logging import MetricsLogger


def load_backbone(config: Config, rng) -> Tuple[Unet, Any, Any]:
    """Load the frozen diffusion backbone (reference:
    models/datasetDM_model.py:31-44): restore checkpoint if present (with
    config drift report), else fresh init with a warning."""
    dtype = jnp.bfloat16 if config.mixed_precision else jnp.float32
    if checkpoint_exists(config.saved_diffusion_model):
        old = load_config(config.saved_diffusion_model)
        unet = Unet(
            dim=old.dim, dim_mults=tuple(old.dim_mults), channels=old.channels,
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
        )
        template = unet.init(
            rng,
            jnp.zeros((1, config.img_size, config.img_size, old.channels)),
            jnp.zeros((1,), jnp.int32),
        )["params"]
        # The saved state includes Adam state; rebuild its template from the
        # embedded config so the restore structure matches, then discard it.
        import optax

        # Mirror the trainer's tx selection (diffusion.py honors
        # --weight_decay with adamw): adamw's chain state has a different
        # structure than adam's, and Orbax restores into the template's
        # shape — an adam template fails on a weight-decay-trained ckpt.
        opt_template = (
            optax.adamw(old.lr, weight_decay=old.weight_decay)
            if old.weight_decay else optax.adam(old.lr)
        ).init(template)
        ckpt_template = {"params": template, "opt_state": opt_template, "step": 0}
        if old.ema_decay > 0.0:
            ckpt_template["ema_params"] = template
        state, _ = load_checkpoint(
            config.saved_diffusion_model, ckpt_template, config,
        )
        sched = make_schedule(old.timesteps, old.beta_schedule)
        # a backbone trained with --ema_decay serves its EMA weights (the
        # averaged weights are the ones validation selected on);
        # --serve_raw_params overrides for the controlled EMA-vs-raw A/B
        served = (state["params"] if config.serve_raw_params
                  else state.get("ema_params", state["params"]))
        return unet, served, sched
    print(
        f"No model found at {config.saved_diffusion_model}. Please load model!"
    )
    unet = Unet(
        dim=config.dim, dim_mults=tuple(config.dim_mults), channels=config.channels,
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
    )
    params = unet.init(
        rng,
        jnp.zeros((1, config.img_size, config.img_size, config.channels)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    sched = make_schedule(config.timesteps, config.beta_schedule)
    return unet, params, sched


def build_task(config: Config, rng) -> SegTask:
    rng_b, rng_c = jax.random.split(rng)
    unet, backbone_params, sched = load_backbone(config, rng_b)
    t_steps = tuple(config.t_steps_to_save)
    S = len(t_steps)
    shared = config.shared_weights_over_timesteps
    stage_channels = tuple(config.dim * m for m in reversed(config.dim_mults))

    clf = PixelClassifier(
        stage_channels=stage_channels,
        n_steps=1 if shared else S,
        out_channels=config.out_channels,
        img_size=config.img_size,
    )

    def features(bp, x, rng):
        apply_fn = lambda xx, tt, **kw: unet.apply({"params": bp}, xx, tt, **kw)
        feats = extract_features(
            apply_fn, sched, x, t_steps, rng=rng,
            normalize=config.normalize and not config.extract_unnormalized,
        )
        return [jax.lax.stop_gradient(f) for f in feats]

    # init classifier on real feature shapes
    dummy = jnp.zeros((1, config.img_size, config.img_size, config.channels))
    feats0 = features(backbone_params, dummy, jax.random.PRNGKey(0))
    cvars = clf.init(rng_c, feats0, train=False)

    def apply(params, aux, x, rng, train):
        feats = features(aux["backbone"], x, rng)
        if train:
            out, upd = clf.apply(
                {"params": params, "batch_stats": aux["bn"]},
                feats, train=True, mutable=["batch_stats"],
            )
            return out, {"backbone": aux["backbone"], "bn": upd["batch_stats"]}
        out = clf.apply(
            {"params": params, "batch_stats": aux["bn"]}, feats, train=False
        )
        return out, aux

    return SegTask(
        apply=apply,
        params=cvars["params"],
        batch_stats={"backbone": backbone_params, "bn": cvars["batch_stats"]},
        fold=S if shared else 1,
        fold_names=t_steps if shared else (),
    )


def main(config: Config) -> None:
    rng = jax.random.PRNGKey(config.seed)
    rng, init_rng = jax.random.split(rng)
    task = build_task(config, init_rng)
    loaders = build_dataloaders(
        "JSRT", config.data_dir, config.img_size, config.batch_size,
        config.num_workers, config.n_labelled_images, seed=config.seed,
        shard_index=jax.process_index(), shard_count=jax.process_count(),
        synthetic=config.synthetic_data, backend=config.data_backend,
        splits_dir=config.splits_dir,
    )
    logger = MetricsLogger(config.log_dir, config, enabled=not config.debug)
    train_segmentation(config, task, loaders, logger)
    logger.close()
