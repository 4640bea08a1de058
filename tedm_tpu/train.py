"""Experiment dispatcher (reference: train.py:15-56).

    python -m tedm_tpu.train --experiment {img_only,baseline,LEDM,LEDMe,
        TEDM,PDDM,global_cl,local_cl,global_finetune,glob_loc_finetune}
        [--dataset {JSRT,CXR14}] [--n_labelled_images N] ...

Differences from the reference, on purpose (SURVEY "Gotchas"): no
hardcoded data_dir overwrite (pass --data_dir, or --synthetic_data);
the TEDM preset keys shared-weights behavior on its own flag; every
choice in --experiment actually dispatches (the reference imports
``datasetDM_per_step.main`` but never calls it)."""

from __future__ import annotations

from typing import Callable, Dict

from tedm_tpu.config import Config, config_from_args


def dispatch(config: Config) -> None:
    from tedm_tpu.trainers import baseline, datasetdm, diffusion

    mains: Dict[str, Callable[[Config], None]] = {
        "img_only": diffusion.main,
        "joint": diffusion.main,
        "conditional": diffusion.main,
        "joint_and_cond": diffusion.main,
        "baseline": baseline.main,
        "LEDM": datasetdm.main,
        "LEDMe": datasetdm.main,
        "TEDM": datasetdm.main,
    }
    if config.experiment == "PDDM":
        from tedm_tpu.trainers import per_step

        mains["PDDM"] = per_step.main
    if config.experiment in ("global_cl", "local_cl", "global_finetune", "glob_loc_finetune"):
        from tedm_tpu.trainers import contrastive

        mains["global_cl"] = contrastive.main_global
        mains["local_cl"] = contrastive.main_local
        mains["global_finetune"] = contrastive.main_finetune
        mains["glob_loc_finetune"] = contrastive.main_finetune
    if config.experiment not in mains:
        raise ValueError(f"unknown experiment {config.experiment}")
    if config.grad_accum > 1 and mains[config.experiment] is not diffusion.main:
        # Fail fast instead of silently ignoring the flag: the supervised/
        # CL loops thread BatchNorm batch_stats through the step, so a
        # microbatch scan would CHANGE the normalization statistics (BN
        # stats over mb rows, not the global batch) — accumulation there
        # is not the exact-identity contract --grad_accum promises
        # (docs/DESIGN.md "Gradient accumulation"). Only the diffusion
        # trainers (stateless UNet) consume it.
        raise ValueError(
            f"--grad_accum is only supported for the diffusion experiments "
            f"(img_only/joint/conditional/joint_and_cond), not "
            f"{config.experiment!r}: its head uses BatchNorm, whose batch "
            "statistics are not microbatch-decomposable"
        )
    if config.multihost:
        import os

        import jax

        # On TPU pods initialize() auto-detects everything; for manual /
        # test clusters (e.g. the 2-process CPU-mesh multihost test) the
        # coordinator is passed via env vars.
        kw = {}
        if os.environ.get("JAX_COORDINATOR_ADDRESS"):
            kw = dict(
                coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]),
            )
        jax.distributed.initialize(**kw)
        print(f"multihost: process {jax.process_index()}/{jax.process_count()}, "
              f"{jax.device_count()} global devices")
    print(f"Experiment folder: {config.log_dir}")
    mains[config.experiment](config)


def main(argv=None) -> None:
    dispatch(config_from_args(argv))


if __name__ == "__main__":
    main()
