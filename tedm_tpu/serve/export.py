"""AOT export of serving functions (jax.export / StableHLO).

A production capability with no reference equivalent: compile-free
serving. The segmentation predictor (or any jitted function) is exported
once to a self-contained StableHLO artifact; a serving process
deserializes and calls it without Python model code, checkpoints, or
tracing — params are baked in as constants.

    # producer
    export_predictor(exp_dir, "/models/tedm197.bin")

    # consumer (any process with jax for the same platform)
    predict = load_exported("/models/tedm197.bin")
    probs = predict(images_nhwc)        # (fold*B, H, W, 1) sigmoids

Exports are platform-specific by default (TPU artifact runs on TPU).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def export_predictor(
    exp_dir: str,
    out_path: str,
    batch_size: int = 1,
    seed: int = 0,
) -> int:
    """Export an experiment's sigmoid predictor (params baked in) to
    ``out_path``. Returns the serialized size in bytes."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from tedm_tpu.eval.harness import load_experiment

    config, state, task = load_experiment(exp_dir)
    params, bstats = state["params"], state["batch_stats"]
    rng = jax.random.PRNGKey(seed)

    @jax.jit
    def predict(x):
        logits, _ = task.apply(params, bstats, x, rng, False)
        return jax.nn.sigmoid(logits.astype(jnp.float32))

    x_spec = jax.ShapeDtypeStruct(
        (batch_size, config.img_size, config.img_size, config.channels),
        jnp.float32,
    )
    exp = jexport.export(predict)(x_spec)
    data = exp.serialize()
    with open(out_path, "wb") as f:
        f.write(data)
    return len(data)


def export_sampler(
    exp_dir: str,
    out_path: str,
    batch_size: int = 1,
    sampler: str = "dpmpp",
    num_steps: int = 20,
) -> int:
    """Export a diffusion checkpoint's full sampling loop (noise -> image,
    params baked in) as one StableHLO artifact. ``sampler``: 'ancestral'
    (reference-faithful T steps), 'ddim', or 'dpmpp'. The callable takes a
    PRNG key array (uint32[2]) and returns images in [0, 1]."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from tedm_tpu.eval.harness import load_diffusion_experiment
    from tedm_tpu.models.diffusion import (
        ddim_sample_loop,
        dpmpp2m_sample_loop,
        sample_loop,
        unnormalize_to_zero_to_one,
    )

    from tedm_tpu.trainers.diffusion import mode_channels

    config, params, unet, sched = load_diffusion_experiment(exp_dir)
    # joint samples 2-channel (img, seg) pairs; conditional modes take the
    # conditioning image/mask as a second exported argument (channel-concat,
    # mirroring trainers/diffusion.py apply_fn_of). config.channels alone
    # would trace the wrong input width for every non-img_only checkpoint.
    x_ch, _ = mode_channels(config)
    conditional = config.experiment in ("conditional", "joint_and_cond")
    shape = (batch_size, config.img_size, config.img_size, x_ch)

    def run(key, cond):
        if cond is None:
            apply_fn = lambda x, t: unet.apply({"params": params}, x, t)
        else:
            apply_fn = lambda x, t: unet.apply(
                {"params": params}, jnp.concatenate([x, cond], axis=-1), t
            )
        if sampler == "ancestral":
            x = sample_loop(apply_fn, sched, key, shape,
                            objective=config.objective)
        elif sampler == "ddim":
            x = ddim_sample_loop(apply_fn, sched, key, shape, num_steps,
                                 objective=config.objective)
        elif sampler == "dpmpp":
            x = dpmpp2m_sample_loop(apply_fn, sched, key, shape, num_steps,
                                    objective=config.objective)
        else:
            raise ValueError(f"unknown sampler {sampler}")
        return unnormalize_to_zero_to_one(jnp.clip(x, -1.0, 1.0))

    key_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)
    if conditional:
        cond_spec = jax.ShapeDtypeStruct(
            (batch_size, config.img_size, config.img_size, 1), jnp.float32
        )
        sample = jax.jit(lambda key, cond: run(key, cond))
        exp = jexport.export(sample)(key_spec, cond_spec)
    else:
        sample = jax.jit(lambda key: run(key, None))
        exp = jexport.export(sample)(key_spec)
    data = exp.serialize()
    with open(out_path, "wb") as f:
        f.write(data)
    return len(data)


def load_exported(path: str) -> Callable[[np.ndarray], np.ndarray]:
    """Deserialize an exported predictor into a callable."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())

    def call(*args):
        return np.asarray(exp.call(*args))

    return call


def main(argv=None) -> None:
    import argparse

    p = argparse.ArgumentParser(
        description="Export a trained experiment's predictor or sampler to StableHLO"
    )
    p.add_argument("kind", choices=["predictor", "sampler"])
    p.add_argument("--experiment", "-e", required=True, help="experiment dir")
    p.add_argument("--out", required=True)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--sampler", type=str, default="dpmpp",
                   choices=["ancestral", "ddim", "dpmpp"])
    p.add_argument("--num_steps", type=int, default=20)
    args = p.parse_args(argv)
    if args.kind == "predictor":
        n = export_predictor(args.experiment, args.out, args.batch_size)
    else:
        n = export_sampler(args.experiment, args.out, args.batch_size,
                           args.sampler, args.num_steps)
    print(f"wrote {args.out} ({n} bytes)")


if __name__ == "__main__":
    main()
