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
* FSDP (ZeRO-3 the GSPMD way): params AND Adam moments are sharded over
  the ``data`` axis itself (largest divisible dim per leaf); XLA
  all-gathers each weight just-in-time for its op and reduce-scatters its
  gradient, so per-chip param+optimizer memory drops ~1/N with no wrapper
  classes, no bucketing code, no hooks — the sharding annotation IS the
  implementation.
* SP (spatial partitioning): batches can additionally shard their H axis
  over a ``spatial`` mesh axis; XLA partitions the convolutions with
  automatic halo exchange. This is the activation-memory lever for 512²+
  training, composable with DP (mesh ('data','spatial')) — activations
  per chip shrink by the spatial factor where attention permits.
* Multi-host: ``make_mesh`` uses all addressable+global devices via
  ``jax.devices()``; per-host data sharding lives in the input pipeline
  (tedm_tpu/data), which feeds each host only its shard.

The reference has no distributed layer at all (SURVEY §2.3: no
torch.distributed/DDP/ZeRO anywhere); all four modes here are TPU-native
capabilities built on one mechanism — NamedSharding annotations consumed
by GSPMD — rather than four code paths.
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
    fsdp_axis: str = "data",
    fsdp_min_size: int = 2 ** 14,
) -> Any:
    """A pytree of NamedShardings matching ``params``.

    ``replicated``: every leaf replicated (pure DP).
    ``tp``: leaves whose trailing (out-channel) dim is divisible by the
    ``model`` axis size and >= ``tp_min_width`` are sharded on that dim.
    ``fsdp``: every leaf with >= ``fsdp_min_size`` elements is sharded over
    the ``data`` axis on its largest divisible dim (ZeRO-3: GSPMD
    all-gathers weights just-in-time per op and reduce-scatters grads;
    applying the same rule to the Adam mu/nu trees shards optimizer state
    identically, which is where the memory win lives). Small leaves
    (biases, norm scales, time-MLP vectors) stay replicated — sharding
    them buys bytes in the KB range and costs a collective each.
    """
    if mode == "fsdp" and fsdp_axis in mesh.axis_names:
        n = mesh.shape[fsdp_axis]

        def fsdp_rule(leaf):
            if (
                hasattr(leaf, "ndim")
                and leaf.ndim >= 1
                and int(np.prod(leaf.shape)) >= fsdp_min_size
            ):
                divisible = [i for i in range(leaf.ndim) if leaf.shape[i] % n == 0]
                if divisible:
                    ax = max(divisible, key=lambda i: leaf.shape[i])
                    spec = [None] * leaf.ndim
                    spec[ax] = fsdp_axis
                    return NamedSharding(mesh, P(*spec))
            return replicated_sharding(mesh)

        return jax.tree_util.tree_map(fsdp_rule, params)
    if mode != "tp" or tp_axis not in mesh.axis_names:
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
    """Trainer-side DP(+TP/FSDP/SP) wiring: returns (shard_batch_fn,
    put_params_fn).

    With >1 device and a divisible batch, builds the mesh from
    config.mesh_shape/mesh_axes (default: all devices on 'data') and shards
    array leading axes over 'data'. Params/optimizer state go through the
    second function: replicated by default, sharded over the 'model' axis
    when ``config.param_sharding == 'tp'`` (wide out-channel kernels per
    ``param_shardings``), or sharded over the 'data' axis itself when
    ``config.param_sharding == 'fsdp'`` (ZeRO-3; Adam mu/nu mirror the
    param tree so the same rule shards them consistently). With
    ``config.shard_spatial`` and a 'spatial' mesh axis, image batches
    additionally shard their H axis over 'spatial' (XLA partitions convs
    with halo exchange — the activation-memory lever for 512²+; note the
    Pallas attention custom-calls are not spatially partitionable, so SP
    pairs with ``--no_pallas`` or the per-shape VMEM gates falling back).
    Otherwise both functions are identity (single chip, or indivisible
    batch — the divisibility constraint is fundamental to even SPMD
    sharding)."""
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
    spatial = getattr(config, "shard_spatial", False)
    if spatial and "spatial" not in mesh.axis_names:
        raise ValueError(
            "--shard_spatial needs a 'spatial' mesh axis, e.g. "
            "--mesh_shape 2 4 --mesh_axes data spatial"
        )
    if spatial and (mode in ("tp", "fsdp") or "spatial2" in mesh.axis_names):
        # Measured miscompile (r5, docs/DESIGN.md "Sharding composition
        # limits"): XLA's SPMD partitioner (jax 0.9.0, CPU backend)
        # produces WRONG conv backward passes whenever a convolution's
        # partitioning spans TWO non-batch factors — grad rel-l2 error vs
        # single-device: 2.4 (tp + H-spatial), 0.054 (fsdp + H-spatial),
        # 0.11 (H+W 2-D spatial) — while the forward loss stays
        # bit-identical, i.e. training silently diverges. Single-factor
        # partitioning is exact (H-only 6.5e-7, W-only 5.5e-7, tp-only,
        # fsdp-only). oneDNN on/off does not change the numbers (ruled
        # out). SP therefore composes only with replicated params and one
        # spatial axis; TP/FSDP compose with plain DP.
        raise ValueError(
            "--shard_spatial composes only with replicated params and a "
            f"single spatial axis (got param_sharding={mode!r}, mesh axes "
            f"{mesh.axis_names}): XLA's SPMD partitioner miscompiles the "
            "conv backward when partitioning spans two non-batch factors "
            "(measured grad error up to 2.4 rel-l2 while the forward "
            "matches — silent wrong training; docs/DESIGN.md). Use "
            "data x spatial with replicated params, or TP/FSDP without SP."
        )
    sp_size = mesh.shape.get("spatial", 1) if spatial else 1
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
    # SP: (B, H, W, C) image batches shard H over 'spatial' on top of the
    # batch axis. Rank-aware spec (images are ndim>=3 here; (B,) valid
    # masks and (B,) timesteps keep the plain batch sharding).
    sp_sh = NamedSharding(mesh, P("data", "spatial")) if sp_size > 1 else None

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
                sh = b_sh
                if (
                    sp_sh is not None
                    and x.ndim >= 3
                    and x.shape[1] % sp_size == 0
                ):
                    sh = sp_sh
                if multihost:
                    return _jax.make_array_from_process_local_data(
                        sh, np.asarray(x)
                    )
                return _jax.device_put(x, sh)
            return _jax.device_put(x, r_sh)

        return _jax.tree_util.tree_map(put, tree)

    def replicate(tree):
        if mode in ("tp", "fsdp"):
            return _jax.device_put(
                tree,
                param_shardings(
                    tree, mesh, mode=mode,
                    tp_min_width=getattr(config, "tp_min_width", 256),
                    fsdp_min_size=getattr(config, "fsdp_min_size", 2 ** 14),
                ),
            )
        return _jax.device_put(tree, r_sh)

    return shard, replicate


