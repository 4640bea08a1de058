"""Mesh construction and sharding rules.

Design (SURVEY §2.3 "First-class TPU-native equivalents to build"):

* DP: the batch axis is sharded over the mesh's ``data`` axis. Because the
  loss is a mean over the global batch and params are replicated, jit/GSPMD
  automatically inserts a ``psum`` of gradients over ICI — this is the
  DDP-equivalent, with zero framework code in the hot path.
* TP: params whose output-channel axis is wide (>= ``tp_min_width``) can be
  sharded over an optional ``model`` axis; GSPMD propagates the sharding
  through the conv/matmul and inserts all-gathers/reduce-scatters where
  profitable. For the 36M-param UNet this is optional but the axis is
  first-class so larger ``dim`` scales without code changes.
* Multi-host: ``make_mesh`` uses all addressable+global devices via
  ``jax.devices()``; per-host data sharding lives in the input pipeline
  (tedm_tpu/data), which feeds each host only its shard.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    mesh_shape: Sequence[int] = (),
    mesh_axes: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a named device mesh.

    With the default empty ``mesh_shape``, all devices form one ``data``
    axis. A 2D example: ``make_mesh((4, 2), ("data", "model"))``. An
    explicit shape smaller than the device count uses the first
    prod(shape) devices (a user asking for a (1, 2) mesh on an 8-device
    host gets exactly that mesh); asking for MORE devices than exist is
    still an error.
    """
    devices = list(devices if devices is not None else jax.devices())
    if not mesh_shape:
        mesh_shape = (len(devices),)
        mesh_axes = tuple(mesh_axes[:1]) or ("data",)
    n = int(np.prod(mesh_shape))
    if n > len(devices):
        raise ValueError(
            f"mesh_shape {tuple(mesh_shape)} needs {n} devices, have {len(devices)}"
        )
    if n < len(devices) and jax.process_count() > 1:
        # Multi-host: silently slicing would build a mesh containing only
        # the coordinator's devices and fail deep inside GSPMD collectives
        # on the other processes — keep the loud, immediate error there.
        raise ValueError(
            f"mesh_shape {tuple(mesh_shape)} uses {n} of {len(devices)} "
            "global devices; in a multi-process run the mesh must cover "
            "every device (subset meshes are single-process only)"
        )
    devices = devices[:n]
    dev_array = np.array(devices).reshape(mesh_shape)
    return Mesh(dev_array, tuple(mesh_axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over ``axis``; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(
    params: Any,
    mesh: Mesh,
    mode: str = "replicated",
    tp_axis: str = "model",
    tp_min_width: int = 256,
) -> Any:
    """A pytree of NamedShardings matching ``params``.

    ``replicated``: every leaf replicated (pure DP).
    ``tp``: leaves whose trailing (out-channel) dim is divisible by the
    ``model`` axis size and >= ``tp_min_width`` are sharded on that dim.
    """
    if mode == "replicated" or tp_axis not in mesh.axis_names:
        return jax.tree_util.tree_map(lambda _: replicated_sharding(mesh), params)
    tp = mesh.shape[tp_axis]

    def rule(leaf):
        if (
            hasattr(leaf, "ndim")
            and leaf.ndim >= 2
            and leaf.shape[-1] >= tp_min_width
            and leaf.shape[-1] % tp == 0
        ):
            spec = [None] * (leaf.ndim - 1) + [tp_axis]
            return NamedSharding(mesh, P(*spec))
        return replicated_sharding(mesh)

    return jax.tree_util.tree_map(rule, params)


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Device-put a host batch with its leading axis sharded over the mesh."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def data_parallel_setup(config, batch_size: int):
    """Trainer-side DP(+TP) wiring: returns (shard_batch_fn, put_params_fn).

    With >1 device and a divisible batch, builds the mesh from
    config.mesh_shape/mesh_axes (default: all devices on 'data') and shards
    array leading axes over 'data'. Params/optimizer state go through the
    second function: replicated by default, or sharded over the 'model'
    axis when ``config.param_sharding == 'tp'`` (wide out-channel kernels
    per ``param_shardings``; Adam mu/nu mirror the param tree so the same
    rule shards them consistently). Otherwise both functions are identity
    (single chip, or indivisible batch — the divisibility constraint is
    fundamental to even SPMD sharding)."""
    import jax as _jax

    mode = getattr(config, "param_sharding", "replicated")
    n_dev = _jax.device_count()
    if n_dev <= 1:
        return (lambda x: x), (lambda x: x)
    mesh = make_mesh(tuple(config.mesh_shape), tuple(config.mesh_axes))
    if mode == "tp" and "model" not in mesh.axis_names:
        raise ValueError(
            "--param_sharding tp needs a 'model' mesh axis, e.g. "
            "--mesh_shape 4 2 --mesh_axes data model"
        )
    # batch_size is PER-HOST; the global batch is batch_size*process_count,
    # so even sharding needs the host batch divisible by the host's share
    # of the mesh's 'data' axis (a 2D mesh replicates the batch over
    # 'model', which demands nothing of the batch size).
    data_size = mesh.shape.get("data", 1)
    local_req = max(1, data_size // _jax.process_count())
    if batch_size % local_req != 0:
        print(f"[parallel] host batch {batch_size} not divisible by {local_req} "
              "(per-host share of the 'data' axis); running replicated "
              "(adjust --batch_size to shard)")
        return (lambda x: x), (lambda x: x)
    b_sh = batch_sharding(mesh)
    r_sh = replicated_sharding(mesh)

    multihost = _jax.process_count() > 1

    def shard(tree):
        # Only arrays with the host batch as leading dim are sharded;
        # everything else (PRNG keys, dummy conds, scalars) replicates.
        # Multi-host: each process loads a DIFFERENT batch_size rows (the
        # loader's per-host shard), so the global array must be assembled
        # from per-process local data — a plain device_put onto the global
        # sharding would either error or drop the other hosts' rows.
        def put(x):
            if getattr(x, "ndim", 0) >= 1 and x.shape[0] == batch_size:
                if multihost:
                    return _jax.make_array_from_process_local_data(
                        b_sh, np.asarray(x)
                    )
                return _jax.device_put(x, b_sh)
            return _jax.device_put(x, r_sh)

        return _jax.tree_util.tree_map(put, tree)

    def replicate(tree):
        if mode == "tp":
            return _jax.device_put(
                tree,
                param_shardings(
                    tree, mesh, mode="tp",
                    tp_min_width=getattr(config, "tp_min_width", 256),
                ),
            )
        return _jax.device_put(tree, r_sh)

    return shard, replicate


