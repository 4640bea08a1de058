"""Fused GroupNorm + FiLM + SiLU Pallas kernel (forward + custom VJP).

The reference ResNet Block is conv -> GroupNorm(8) -> x*(scale+1)+shift ->
SiLU (models/unet_model.py:119-135). The UNet runs 38 of these GroupNorms
per forward; profiling the bf16 batch-8 forward on v5e showed the XLA
lowering spends 3.7 ms of the 9.9 ms step in standalone normalization
reduce passes (`convert_reduce_fusion` x55) — i.e. every norm pays one
extra full HBM traversal just to compute its statistics before the
normalize pass reads the tensor again.

This kernel keeps the whole (N=H*W, C) slab of one batch element resident
in VMEM and does BOTH passes there: per-channel sum/sum-of-squares
accumulated tile-by-tile (fp32), group statistics folded per-channel via a
constant (C, C) group-membership matmul (layout-friendly: no 3D reshapes),
then the normalize+FiLM+SiLU epilogue written straight out — ONE HBM read
and ONE write per GroupNorm instead of two reads + one write.

The backward pass is the textbook analytic GroupNorm VJP in plain jnp
(bandwidth-equivalent to XLA autodiff; the forward is where the sampling
loop spends its time).

On CPU the public entrypoint falls back to a jnp reference implementation
(identical math) so tests and the virtual-device mesh run anywhere.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _group_matrix(c: int, groups: int) -> jnp.ndarray:
    """(C, C) fp32 matrix with M[i, j] = 1 iff channels i, j share a group.
    s @ M broadcasts per-group sums back to per-channel lanes on the MXU."""
    gid = jnp.arange(c) // (c // groups)
    return (gid[:, None] == gid[None, :]).astype(jnp.float32)


# --------------------------------------------------------------------- kernel


def _gn_kernel(x_ref, gamma_ref, beta_ref, s_ref, sh_ref, o_ref, *,
               groups: int, eps: float, tile: int):
    n, c = x_ref.shape[1], x_ref.shape[2]
    n_tiles = n // tile
    m = _group_matrix(c, groups)  # constant, materialized in VMEM

    def stat_body(i, acc):
        s_acc, q_acc = acc
        xt = x_ref[0, pl.ds(i * tile, tile), :].astype(jnp.float32)
        return (
            s_acc + jnp.sum(xt, axis=0, keepdims=True),
            q_acc + jnp.sum(xt * xt, axis=0, keepdims=True),
        )

    zeros = jnp.zeros((1, c), jnp.float32)
    s_sum, q_sum = jax.lax.fori_loop(0, n_tiles, stat_body, (zeros, zeros))

    cnt = float(n * (c // groups))
    # precision=HIGHEST: the default MXU precision TRUNCATES f32 operands to
    # bf16, which broke the "stats always fp32" contract — the on-chip gate
    # (scripts/kernel_check.py) measured 6e-3 max-abs error vs the jnp
    # reference until these two (1,C)@(C,C) dots (cost: negligible) ran at
    # full f32.
    mean = jax.lax.dot_general(  # (1, C): per-channel copy of its group mean
        s_sum, m, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) / cnt
    ex2 = jax.lax.dot_general(
        q_sum, m, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) / cnt
    rstd = jax.lax.rsqrt(jnp.maximum(ex2 - mean * mean, 0.0) + eps)

    pid = pl.program_id(0)
    gamma = gamma_ref[0].reshape(1, c)
    beta = beta_ref[0].reshape(1, c)
    # scale/shift arrive as full (B, C) blocks: a (1, C) tile of a (B, C)
    # array is not a legal TPU block shape (sublane dim 1 != B), so the
    # kernel slices its own row instead.
    film = s_ref[pl.ds(pid, 1), :] + 1.0
    # y = (x - mean) * rstd * gamma * film + (beta * film + shift)
    a = rstd * gamma * film
    b = (beta - mean * rstd * gamma) * film + sh_ref[pl.ds(pid, 1), :]

    def apply_body(i, _):
        xt = x_ref[0, pl.ds(i * tile, tile), :].astype(jnp.float32)
        y = xt * a + b
        o_ref[0, pl.ds(i * tile, tile), :] = (
            y * jax.nn.sigmoid(y)
        ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_tiles, apply_body, 0)


def _pick_tile(n: int) -> int:
    for t in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if n % t == 0:
            return t
    return 0


# Scoped-VMEM budget for the whole-slab design. Calibrated ON-CHIP (r3):
# at (B=8, N=65536, C=64) bf16 the compiler reported 64.01 MB of scoped
# demand for an 8 MB (N, C) slab — 8x the slab bytes (double-buffered
# bf16 in+out blocks ~4x, plus fp32 tile temporaries the compiler keeps
# live across the two fori_loop passes ~4x). Gate at 60 MB of modeled
# demand so the 64 MB vmem_limit_bytes always clears with margin:
# 128² C=64 (16 MB demand) and every C>=128 stage of a 256² UNet pass;
# the 256² C=64 stage (64 MB) falls back to the jnp reference instead of
# failing to compile (it did, by 8 KB, before this guard).
_GN_VMEM_BUDGET = 60 * 1024 * 1024


def gn_fits_vmem(n: int, c: int, itemsize: int) -> bool:
    """True if the fused kernel's modeled scoped-VMEM demand fits."""
    return 8 * n * c * itemsize <= _GN_VMEM_BUDGET


def _fwd_pallas(x3: Array, gamma: Array, beta: Array, scale: Array,
                shift: Array, groups: int, eps: float, tile: int,
                interpret: bool) -> Array:
    b, n, c = x3.shape
    vec = lambda: pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    per_b = lambda: pl.BlockSpec((b, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_gn_kernel, groups=groups, eps=eps, tile=tile),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x3.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            vec(), vec(), per_b(), per_b(),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * n * c, bytes_accessed=2 * b * n * c * x3.dtype.itemsize,
            transcendentals=2 * b * n * c,
        ),
    )(x3, gamma.reshape(1, c), beta.reshape(1, c), scale, shift)


# ---------------------------------------------------------------- jnp paths


def group_norm_film_silu_reference(
    x: Array, gamma: Array, beta: Array,
    scale: Optional[Array] = None, shift: Optional[Array] = None,
    *, groups: int = 8, eps: float = 1e-5,
) -> Array:
    """Pure-jnp GroupNorm -> FiLM -> SiLU — the single source of truth for
    the math (the Pallas kernel is tested against it; the UNet's XLA path
    calls it, so model and kernel fallback can never drift apart)."""
    b, _, _, c = x.shape
    if scale is None:
        scale = jnp.zeros((b, c), jnp.float32)
    if shift is None:
        shift = jnp.zeros((b, c), jnp.float32)
    return _reference(x, gamma, beta, scale, shift, groups, eps)


def _reference(x: Array, gamma: Array, beta: Array, scale: Array,
               shift: Array, groups: int, eps: float) -> Array:
    """jnp reference: identical math, NHWC, biased variance, fp32 stats.

    Variance via E[x²]−μ² (NOT the centered two-pass form): XLA fuses the
    sum and sum-of-squares into ONE stats traversal, while a centered
    variance needs the mean first and re-reads the tensor — measured 4.5%
    slower on the whole UNet forward (796 → 760 steps/s). Same formula as
    the Pallas kernel."""
    bsz, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(bsz, h * w, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    ex2 = (xf * xf).mean(axis=(1, 3), keepdims=True)
    var = jnp.maximum(ex2 - mean * mean, 0.0)
    xhat = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(bsz, h, w, c)
    gn = xhat * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    f = gn * (scale[:, None, None, :] + 1.0) + shift[:, None, None, :]
    return (f * jax.nn.sigmoid(f)).astype(x.dtype)


def _bwd_jnp(groups, eps, res, g) -> Tuple[Array, Array, Array, Array, Array]:
    x, gamma, beta, scale, shift = res
    bsz, h, w, c = x.shape
    n = h * w
    cg = c // groups
    xf = x.astype(jnp.float32).reshape(bsz, n, groups, cg)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    ex2 = (xf * xf).mean(axis=(1, 3), keepdims=True)
    rstd = jax.lax.rsqrt(jnp.maximum(ex2 - mean * mean, 0.0) + eps)
    xhat = ((xf - mean) * rstd).reshape(bsz, n, c)

    gammaf = gamma.astype(jnp.float32)
    film = scale.astype(jnp.float32)[:, None, :] + 1.0  # (B, 1, C)
    gn = xhat * gammaf + beta.astype(jnp.float32)
    f = gn * film + shift.astype(jnp.float32)[:, None, :]
    sig = jax.nn.sigmoid(f)
    gf = g.astype(jnp.float32).reshape(bsz, n, c)
    df = gf * sig * (1.0 + f * (1.0 - sig))          # SiLU VJP

    dshift = df.sum(axis=1)                           # (B, C)
    dscale = (df * gn).sum(axis=1)                    # (B, C)
    dgn = df * film
    dgamma = (dgn * xhat).sum(axis=(0, 1))            # (C,)
    dbeta = dgn.sum(axis=(0, 1))                      # (C,)

    dxhat = (dgn * gammaf).reshape(bsz, n, groups, cg)
    xhat_g = xhat.reshape(bsz, n, groups, cg)
    m1 = dxhat.mean(axis=(1, 3), keepdims=True)
    m2 = (dxhat * xhat_g).mean(axis=(1, 3), keepdims=True)
    dx = rstd * (dxhat - m1 - xhat_g * m2)
    return (
        dx.reshape(bsz, h, w, c).astype(x.dtype),
        dgamma.astype(gamma.dtype),
        dbeta.astype(beta.dtype),
        dscale.astype(scale.dtype),
        dshift.astype(shift.dtype),
    )


# ------------------------------------------------------------------ dispatch


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _gn_film_silu(x, gamma, beta, scale, shift, groups, eps, interpret):
    b, h, w, c = x.shape
    tile = _pick_tile(h * w)
    x3 = x.reshape(b, h * w, c)
    out = _fwd_pallas(
        x3, gamma.astype(jnp.float32), beta.astype(jnp.float32),
        scale.astype(jnp.float32), shift.astype(jnp.float32),
        groups, eps, tile, interpret,
    )
    return out.reshape(b, h, w, c)


def _gn_fwd(x, gamma, beta, scale, shift, groups, eps, interpret):
    return (
        _gn_film_silu(x, gamma, beta, scale, shift, groups, eps, interpret),
        (x, gamma, beta, scale, shift),
    )


def _gn_bwd(groups, eps, interpret, res, g):
    return _bwd_jnp(groups, eps, res, g)


_gn_film_silu.defvjp(_gn_fwd, _gn_bwd)


def fused_group_norm_film_silu(
    x: Array,
    gamma: Array,
    beta: Array,
    scale: Optional[Array] = None,
    shift: Optional[Array] = None,
    *,
    groups: int = 8,
    eps: float = 1e-5,
    interpret: Optional[bool] = None,
) -> Array:
    """GroupNorm(groups) -> x*(scale+1)+shift -> SiLU, fused.

    x: (B, H, W, C); gamma/beta: (C,); scale/shift: (B, C) or None (no FiLM).
    Statistics in fp32 (biased variance), output in x.dtype. On non-TPU
    backends dispatches to the jnp reference path (identical math).
    """
    b, _, _, c = x.shape
    if scale is None:
        scale = jnp.zeros((b, c), jnp.float32)
    if shift is None:
        shift = jnp.zeros((b, c), jnp.float32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret:
        return _reference(x, gamma, beta, scale, shift, groups, eps)
    n = x.shape[1] * x.shape[2]
    if (c % groups or _pick_tile(n) == 0
            or not gn_fits_vmem(n, c, x.dtype.itemsize)):
        return _reference(x, gamma, beta, scale, shift, groups, eps)
    return _gn_film_silu(x, gamma, beta, scale, shift, groups, eps, False)


def fused_group_norm_film_silu_interpret(x, gamma, beta, scale=None, shift=None,
                                         *, groups: int = 8, eps: float = 1e-5):
    """Force the Pallas kernel through the interpreter (for CPU tests)."""
    b, _, _, c = x.shape
    if scale is None:
        scale = jnp.zeros((b, c), jnp.float32)
    if shift is None:
        shift = jnp.zeros((b, c), jnp.float32)
    if c % groups or _pick_tile(x.shape[1] * x.shape[2]) == 0:
        # kernel-unsupported shape (odd H*W / non-divisible channels):
        # same fallback as the compiled entry, never a trace-time crash
        return _reference(x, gamma, beta, scale, shift, groups, eps)
    return _gn_film_silu(x, gamma, beta, scale, shift, groups, eps, True)
