"""Fused linear attention Pallas kernel (forward + custom VJP).

Computes, per (batch, head), over inputs q, k, v of shape (d, N):

    s   = softmax(q, axis=d) * scale
    p   = softmax(k, axis=N)
    C   = p @ (v/N)^T               # (d, e) context — an MXU matmul
    out = C^T @ s                   # (e, N)

This is the reference's LinearAttention inner math
(models/unet_model.py:178-210) with the two softmaxes, the 1/N value
scaling, and both matmuls fused into one VMEM-resident kernel: at the
128x128 stage N=16384 and each (B, h, d, N) tensor is ~128 MB in fp32 at
batch 16, so skipping the HBM round trips for softmax(q)/softmax(k)
saves ~4 full tensor transfers per layer.

The backward pass is the analytically-derived VJP, also one fused kernel:

    dqf = C @ g            dC = qf @ g^T
    dq  = s*(scale*dqf - sum_d(s*scale*dqf))        (softmax-d VJP)
    dv  = (dC^T @ p) / N
    dp  = dC @ (v/N)
    dk  = p*(dp - sum_N(p*dp))                       (softmax-N VJP)

Softmaxes are recomputed in the backward kernel (cheap, VPU-bound)
instead of storing them — HBM bandwidth is the bottleneck, not FLOPs.

On CPU the public entrypoint falls back to a jnp reference implementation
(identical math) so tests and the virtual-device mesh run anywhere.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _softmax(x: Array, axis: int) -> Array:
    m = jnp.max(x, axis=axis, keepdims=True)
    e = jnp.exp(x - m)
    return e / jnp.sum(e, axis=axis, keepdims=True)


# --------------------------------------------------------------------- kernels


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # (d, N)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    n = q.shape[1]
    s = _softmax(q, axis=0) * scale
    p = _softmax(k, axis=1)
    vf = v * (1.0 / n)
    # C[d, e] = sum_n p[d, n] vf[e, n]
    ctx = jax.lax.dot_general(
        p, vf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # out[e, n] = sum_d C[d, e] s[d, n]
    out = jax.lax.dot_general(
        ctx, s, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    n = q.shape[1]
    s = _softmax(q, axis=0)
    qf = s * scale
    p = _softmax(k, axis=1)
    vf = v * (1.0 / n)

    ctx = jax.lax.dot_general(
        p, vf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dqf[d, n] = sum_e C[d, e] g[e, n]
    dqf = jax.lax.dot_general(
        ctx, g, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = dqf * scale
    dq = s * (ds - jnp.sum(s * ds, axis=0, keepdims=True))

    # dC[d, e] = sum_n qf[d, n] g[e, n]
    dctx = jax.lax.dot_general(
        qf, g, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dvf[e, n] = sum_d dC[d, e] p[d, n]
    dvf = jax.lax.dot_general(
        dctx, p, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dv = dvf * (1.0 / n)
    # dp[d, n] = sum_e dC[d, e] vf[e, n]
    dp = jax.lax.dot_general(
        dctx, vf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk = p * (dp - jnp.sum(p * dp, axis=1, keepdims=True))

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# ------------------------------------------------------------------ dispatch


def _spec(d: int, n: int):
    return pl.BlockSpec((1, d, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _fwd_pallas(q: Array, k: Array, v: Array, scale: float, interpret: bool) -> Array:
    bh, d, n = q.shape
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, d, n), q.dtype),
        grid=(bh,),
        in_specs=[_spec(d, n)] * 3,
        out_specs=_spec(d, n),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024  # fp32 rows at N=16k need >16M
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * d * d * n, bytes_accessed=4 * bh * d * n * 4, transcendentals=2 * bh * d * n
        ),
    )(q, k, v)


def _bwd_pallas(q, k, v, g, scale: float, interpret: bool):
    bh, d, n = q.shape
    shapes = [jax.ShapeDtypeStruct((bh, d, n), q.dtype)] * 3
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        out_shape=shapes,
        grid=(bh,),
        in_specs=[_spec(d, n)] * 4,
        out_specs=[_spec(d, n)] * 3,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * d * d * n, bytes_accessed=7 * bh * d * n * 4, transcendentals=2 * bh * d * n
        ),
    )(q, k, v, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _linear_attention_bhdn(q, k, v, scale: float, interpret: bool):
    return _fwd_pallas(q, k, v, scale, interpret)


def _la_fwd(q, k, v, scale, interpret):
    return _fwd_pallas(q, k, v, scale, interpret), (q, k, v)


def _la_bwd(scale, interpret, res, g):
    q, k, v = res
    dq, dk, dv = _bwd_pallas(q, k, v, g, scale, interpret)
    return dq, dk, dv


_linear_attention_bhdn.defvjp(_la_fwd, _la_bwd)


def linear_attention_reference(q: Array, k: Array, v: Array, scale: float) -> Array:
    """jnp reference (identical math, XLA-fused): q, k, v (B, h, d, N)."""
    n = q.shape[-1]
    qf = jax.nn.softmax(q.astype(jnp.float32), axis=2) * scale
    kf = jax.nn.softmax(k.astype(jnp.float32), axis=3)
    vf = v.astype(jnp.float32) / n
    ctx = jnp.einsum("bhdn,bhen->bhde", kf, vf)
    return jnp.einsum("bhde,bhdn->bhen", ctx, qf).astype(q.dtype)


def linear_attention(
    q: Array, k: Array, v: Array, scale: float, interpret: Optional[bool] = None
) -> Array:
    """Fused linear attention over (B, heads, dim_head, N) tensors.

    Returns (B, heads, dim_head, N) in the input dtype (fp32 accumulation).
    On non-TPU backends dispatches to the jnp reference path.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret:
        # Interpreter-mode pallas is slow; the jnp path is numerically the
        # same (used by tests to cross-check the compiled kernel).
        return linear_attention_reference(q, k, v, scale)
    b, h, d, n = q.shape
    flat = lambda t: t.reshape(b * h, d, n)
    out = _linear_attention_bhdn(flat(q), flat(k), flat(v), float(scale), False)
    return out.reshape(b, h, d, n)


def linear_attention_interpret(q: Array, k: Array, v: Array, scale: float) -> Array:
    """Force the Pallas kernel through the interpreter (for CPU tests)."""
    b, h, d, n = q.shape
    flat = lambda t: t.reshape(b * h, d, n)
    out = _linear_attention_bhdn(flat(q), flat(k), flat(v), float(scale), True)
    return out.reshape(b, h, d, n)
