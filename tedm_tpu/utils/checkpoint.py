"""Orbax checkpointing with the reference's checkpoint contract.

The reference saves ``{model_state_dict, optimizer_state_dict, config,
step}`` only on new best validation loss (trainers/train_base_diffusion.py:
164-183) and diffs the embedded config against the live one at load
(``compare_configs``, trainers/utils.py:154-174). This module keeps that
contract — config embedded beside the state, drift reported on load — and
fixes the reference defect of *only* best-val saving (SURVEY §5): periodic
saves are supported via ``ckpt_every``.

Layout (a directory, not a single file):
    <path>/state/...      Orbax PyTree checkpoint (params, opt_state, step,
                          batch_stats, anything in the train-state pytree)
    <path>/config.json    the Config that produced it
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from tedm_tpu.config import Config, diff_configs


def save_checkpoint(path: str, state: Any, config: Config) -> None:
    """Write ``state`` (any pytree) + ``config`` to ``path`` atomically."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "state"), state, force=True)
    if jax.process_index() == 0:
        config.save(os.path.join(path, "config.json"))


def load_config(path: str) -> Config:
    return Config.load(os.path.join(os.path.abspath(path), "config.json"))


def load_checkpoint(
    path: str,
    target: Any,
    config: Optional[Config] = None,
    verbose: bool = True,
) -> Tuple[Any, Config]:
    """Restore a checkpoint into the structure of ``target``.

    Returns (state, embedded_config); if ``config`` is given, reports keys
    that drifted (reference: trainers/utils.py:154-174).
    """
    path = os.path.abspath(path)
    old_config = load_config(path)
    if config is not None and verbose:
        diff_configs(old_config, config)
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.join(path, "state"), abstract)
    return state, old_config


def checkpoint_exists(path: str) -> bool:
    return os.path.isdir(os.path.join(os.path.abspath(path), "state"))
