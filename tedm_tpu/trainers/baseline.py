"""Supervised UNet segmentation baseline on JSRT
(reference: trainers/train_baseline.py:164-211).

The UNet runs with ``time=None`` (no FiLM conditioning), exactly like the
reference's ``model(x)`` call (train_baseline.py:37); params are still
initialized WITH a timestep so the parameter tree (and count) matches the
diffusion UNet — the reference torch module also always instantiates
time_mlp."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tedm_tpu.config import Config
from tedm_tpu.data import build_dataloaders
from tedm_tpu.models.unet import Unet
from tedm_tpu.trainers.common import SegTask, train_segmentation
from tedm_tpu.utils.logging import MetricsLogger


def build_task(config: Config, rng) -> SegTask:
    dtype = jnp.bfloat16 if config.mixed_precision else jnp.float32
    unet = Unet(
        dim=config.dim,
        dim_mults=tuple(config.dim_mults),
        channels=config.channels,
        out_dim=config.out_channels,
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
    variables = unet.init(
        rng,
        jnp.zeros((1, config.img_size, config.img_size, config.channels)),
        jnp.zeros((1,), jnp.int32),
    )

    def apply(params, batch_stats, x, rng, train):
        logits = unet.apply({"params": params}, x, None)
        return logits.astype(jnp.float32), batch_stats

    return SegTask(apply=apply, params=variables["params"], batch_stats={})


def main(config: Config) -> None:
    rng = jax.random.PRNGKey(config.seed)
    rng, init_rng = jax.random.split(rng)
    task = build_task(config, init_rng)
    loaders = build_dataloaders(
        "JSRT",
        config.data_dir,
        config.img_size,
        config.batch_size,
        config.num_workers,
        config.n_labelled_images,
        seed=config.seed,
        shard_index=jax.process_index(),
        shard_count=jax.process_count(),
        synthetic=config.synthetic_data,
        backend=config.data_backend,
        splits_dir=config.splits_dir,
    )
    print(
        f"Loaded {len(loaders['train'].indices)} training and "
        f"{len(loaders['val'].indices)} validation images"
    )
    logger = MetricsLogger(config.log_dir, config, enabled=not config.debug)
    train_segmentation(config, task, loaders, logger)
    logger.close()
