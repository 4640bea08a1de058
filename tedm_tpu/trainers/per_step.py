"""PDDM: per-timestep linear probes over diffusion features.

Reference: trainers/datasetDM_per_step.py — a single 1x1 conv over the
S*960-channel features, trained with the shared supervised loop, used for
the paper's per-timestep analysis (Step_1 / Step_10 / ... experiment dirs).

The reference computes a full-dataset feature mean/std pre-pass
(:104-113) but then applies the classifier to the RAW features because the
normalized tensor is discarded (:30-31). Here ``standardize_features``
actually standardizes (flag-gated; default off = reference behavior).
Reference moments are per-(channel, pixel) with an off-by-pixel-count
denominator; ours are per-channel over (batch, space) — the principled
version, documented rather than bug-copied (SURVEY §7 build plan item 6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tedm_tpu.config import Config
from tedm_tpu.data import build_dataloaders
from tedm_tpu.models.segmentation import LinearProbe, masked_feature_sums
from tedm_tpu.trainers.common import SegTask, train_segmentation
from tedm_tpu.trainers.datasetdm import load_backbone
from tedm_tpu.models.segmentation import extract_features
from tedm_tpu.utils.logging import MetricsLogger


def build_task(config: Config, rng, loaders=None, compute_stats: bool = True) -> SegTask:
    """``compute_stats=False`` skips the full-dataset moments pre-pass and
    leaves the init-value stats placeholders — for checkpoint-restore paths
    (eval/serve) where the saved stats overwrite them immediately anyway;
    the pre-pass there wasted one backbone forward per train image."""
    rng_b, rng_c, rng_m = jax.random.split(rng, 3)
    unet, backbone_params, sched = load_backbone(config, rng_b)
    t_steps = tuple(config.t_steps_to_save)
    S = len(t_steps)
    stage_channels = tuple(config.dim * m for m in reversed(config.dim_mults))

    probe = LinearProbe(
        stage_channels=stage_channels,
        n_steps=S,
        out_channels=config.out_channels,
        img_size=config.img_size,
        standardize=config.standardize_features,
    )

    def features(bp, x, rng):
        apply_fn = lambda xx, tt, **kw: unet.apply({"params": bp}, xx, tt, **kw)
        feats = extract_features(
            apply_fn, sched, x, t_steps, rng=rng,
            normalize=config.normalize and not config.extract_unnormalized,
        )
        return [jax.lax.stop_gradient(f) for f in feats]

    dummy = jnp.zeros((1, config.img_size, config.img_size, config.channels))
    pvars = probe.init(rng_c, features(backbone_params, dummy, jax.random.PRNGKey(0)))

    stats = dict(pvars.get("stats", {}))
    if config.standardize_features and compute_stats:
        # Full-dataset moments pre-pass (reference: datasetDM_per_step.py:
        # 104-113), with padded batch rows masked out of the sums.
        sums_fn = jax.jit(
            lambda x, v, r: masked_feature_sums(
                features(backbone_params, x, r), S, v
            )
        )
        sum_acc = sq_acc = cnt_acc = None
        for batch in loaders["train"]:
            rng_m, sub = jax.random.split(rng_m)
            s_, q_, c_ = (np.asarray(a) for a in sums_fn(
                batch["image"], batch["valid"], sub
            ))
            sum_acc = s_ if sum_acc is None else sum_acc + s_
            sq_acc = q_ if sq_acc is None else sq_acc + q_
            cnt_acc = c_ if cnt_acc is None else cnt_acc + c_
        mean = sum_acc / cnt_acc
        std = np.sqrt(np.maximum(sq_acc / cnt_acc - mean**2, 0.0)) + 1e-6
        stats = {"mean": jnp.asarray(mean), "std": jnp.asarray(std)}

    def apply(params, aux, x, rng, train):
        feats = features(aux["backbone"], x, rng)
        out = probe.apply({"params": params, "stats": aux["stats"]}, feats)
        return out, aux

    return SegTask(
        apply=apply,
        params=pvars["params"],
        batch_stats={"backbone": backbone_params, "stats": stats},
    )


def main(config: Config) -> None:
    rng = jax.random.PRNGKey(config.seed)
    rng, init_rng = jax.random.split(rng)
    loaders = build_dataloaders(
        "JSRT", config.data_dir, config.img_size, config.batch_size,
        config.num_workers, config.n_labelled_images, seed=config.seed,
        shard_index=jax.process_index(), shard_count=jax.process_count(),
        synthetic=config.synthetic_data, backend=config.data_backend,
        splits_dir=config.splits_dir,
    )
    task = build_task(config, init_rng, loaders)
    logger = MetricsLogger(config.log_dir, config, enabled=not config.debug)
    train_segmentation(config, task, loaders, logger)
    logger.close()
