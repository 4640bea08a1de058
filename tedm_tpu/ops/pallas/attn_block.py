"""Fully-fused PreNorm linear-attention block Pallas kernel.

The UNet wraps linear attention at every resolution stage as
``Residual(PreNorm(LinearAttention))`` (reference: models/unet_model.py:29-36,
64-73, 178-210):

    y   = ChanLayerNorm_in(x)                    # per-position, gain only
    qkv = y @ W_qkv                              # 1x1 conv, no bias
    a   = linear_attention(q, k, v)              # softmax-d q, softmax-N k
    o   = a @ W_out + b_out                      # 1x1 conv
    o   = ChanLayerNorm_out(o)
    out = o + x                                  # residual

Profiled on v5e (round 2): the UNCHAINED version of this block costs
4.1 ms of the 10.7 ms bf16 batch-8 forward — not in math but in layout
copies: the 1x1 convs prefer a spatial-major output layout, while the
attention contractions need channels minor, so XLA materializes every
q/k/v (and the attention output) through full-tensor relayout copies
(~1.9 ms "data formatting" + the dismembered fusions around them). The
HBM floor of the whole chain is one read of x and one write of out.

This kernel runs the entire chain per batch element in VMEM:

* all four heads live side by side in the lane axis — q/k/v are (N, 128)
  slabs, so there is no head transpose anywhere;
* q's per-head softmax over d subtracts the per-row max over ALL lanes
  (a per-row constant: softmax-invariant, and >= every per-head max) and
  normalizes with per-head lane-slice sums;
* the (d, e) context is one (128, N)@(N, 128) MXU matmul masked to its
  4 diagonal 32x32 head blocks (cross-head lanes fall out of the mask;
  the extra FLOPs are noise at d=32);
* matmuls run at the MXU's default precision with fp32 accumulation —
  exactly what the unfused flax convs and jnp einsums lower to — so the
  kernel is numerically interchangeable with the XLA path it replaces;
* norm statistics are fp32 lane reduces (the "stats always fp32"
  contract, same as ops/pallas/groupnorm.py).

The backward pass is ``jax.vjp`` over the jnp reference composition:
training gradients take the exact XLA path they take today (the fused
kernel accelerates the forward leg; the backward was never
relayout-bound because XLA fuses the transposed contractions).

On CPU the public entrypoint falls back to the jnp reference (identical
math) so tests and the virtual-device mesh run anywhere.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _head_mask(hidden: int, heads: int) -> jnp.ndarray:
    """(hidden, hidden) fp32 block-diagonal head mask."""
    hid = jnp.arange(hidden) // (hidden // heads)
    return (hid[:, None] == hid[None, :]).astype(jnp.float32)


def _cln(xf: Array, g: Array, eps: float = 1e-5) -> Array:
    """Channel LayerNorm over the lane axis of an (N, C) fp32 slab
    (reference: models/unet_model.py:52-61 — biased variance, gain only)."""
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=1, keepdims=True) - mean * mean, 0.0)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * g


def _kernel(x_ref, gin_ref, wqkv_ref, wout_ref, bout_ref, gout_ref, o_ref, *,
            heads: int, dim_head: int, scale: float):
    n, c = x_ref.shape[1], x_ref.shape[2]
    hidden = heads * dim_head
    cdt = x_ref.dtype  # compute dtype of the unfused path (bf16 or f32)

    xf = x_ref[0].astype(jnp.float32)                       # (N, C)
    y = _cln(xf, gin_ref[0].reshape(1, c)).astype(cdt)      # conv input dtype

    # qkv projection: one (N, C)@(C, 3*hidden) MXU matmul, fp32 accumulation
    # at default precision — identical lowering to the unfused 1x1 conv.
    qkv = jax.lax.dot_general(
        y, wqkv_ref[0].astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # (N, 3*hidden)
    q = qkv[:, :hidden]
    k = qkv[:, hidden:2 * hidden]
    v = qkv[:, 2 * hidden:]

    # k: softmax over positions (rows). Column max is a per-column constant.
    kexp = jnp.exp(k - jnp.max(k, axis=0, keepdims=True))
    sk = jnp.sum(kexp, axis=0, keepdims=True)                # (1, hidden)
    # context[d, e] = sum_n softmax_k[n, d] * (v[n, e] / N), head-blocked.
    ctx = jax.lax.dot_general(
        kexp.astype(cdt), v.astype(cdt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # (hidden, hidden)
    ctx = ctx * _head_mask(hidden, heads) / (sk.reshape(hidden, 1) * float(n))

    # q: per-head softmax over d. Subtracting the per-row max over ALL lanes
    # is softmax-invariant (per-row constant) and bounds every exp by 1.
    qe = jnp.exp(q - jnp.max(q, axis=1, keepdims=True))
    parts = []
    for h in range(heads):
        sl = qe[:, h * dim_head:(h + 1) * dim_head]
        parts.append(sl / jnp.sum(sl, axis=1, keepdims=True))
    qs = jnp.concatenate(parts, axis=1) * scale              # (N, hidden)

    attn = jax.lax.dot_general(
        qs.astype(cdt), ctx.astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # (N, hidden)

    # to_out 1x1 conv + bias, then ChanLayerNorm_out, then the residual.
    o = jax.lax.dot_general(
        attn.astype(cdt), wout_ref[0].astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bout_ref[0].reshape(1, c)
    o = _cln(o, gout_ref[0].reshape(1, c))
    o_ref[0] = (o + xf).astype(o_ref.dtype)


def _param_spec(shape):
    # weights are broadcast to every program: constant index map
    return pl.BlockSpec((1,) + shape, lambda i: (0,) * (len(shape) + 1),
                        memory_space=pltpu.VMEM)


def _fwd_pallas(x3, g_in, w_qkv, w_out, b_out, g_out, heads, dim_head, scale,
                interpret):
    b, n, c = x3.shape
    hidden = heads * dim_head
    slab = pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, heads=heads, dim_head=dim_head, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x3.dtype),
        grid=(b,),
        in_specs=[
            slab,
            _param_spec((c,)),
            _param_spec((c, 3 * hidden)),
            _param_spec((hidden, c)),
            _param_spec((c,)),
            _param_spec((c,)),
        ],
        out_specs=slab,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024  # (N,3h) fp32 slabs at N=16k
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (c * 3 * hidden + 2 * hidden * hidden + hidden * c),
            bytes_accessed=2 * b * n * c * x3.dtype.itemsize,
            transcendentals=2 * b * n * hidden,
        ),
    )(x3, g_in[None], w_qkv[None], w_out[None], b_out[None], g_out[None])


def prenorm_linear_attention_reference(
    x: Array, g_in: Array, w_qkv: Array, w_out: Array, b_out: Array,
    g_out: Array, *, heads: int = 4, dim_head: int = 32,
    scale: Optional[float] = None,
) -> Array:
    """jnp reference of the whole block on (B, N, C) — the single source of
    truth for the math; the Pallas kernel is tested against it and the
    backward pass differentiates through it. Mirrors the KERNEL op by op
    (same contractions, same cast points, same fp32 norm stats) so the
    on-chip gate holds a tight tolerance; equivalence to the unfused
    module chain is asserted separately at compute-dtype tolerance
    (tests/test_pallas.py) because the kernel normalizes the context
    after its matmul where the unfused path normalizes before."""
    if scale is None:
        scale = dim_head ** -0.5
    b, n, c = x.shape
    hidden = heads * dim_head
    cdt = x.dtype

    def cln(t, g):
        tf = t.astype(jnp.float32)
        mean = jnp.mean(tf, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(tf * tf, axis=-1, keepdims=True) - mean * mean, 0.0)
        return (tf - mean) * jax.lax.rsqrt(var + 1e-5) * g

    y = cln(x, g_in).astype(cdt)
    qkv = jnp.einsum("bnc,cd->bnd", y, w_qkv.astype(cdt),
                     preferred_element_type=jnp.float32)
    q = qkv[..., :hidden]
    k = qkv[..., hidden:2 * hidden]
    v = qkv[..., 2 * hidden:]

    kexp = jnp.exp(k - jnp.max(k, axis=1, keepdims=True))
    sk = jnp.sum(kexp, axis=1, keepdims=True)                # (b, 1, hidden)
    ctx = jnp.einsum("bnd,bne->bde", kexp.astype(cdt), v.astype(cdt),
                     preferred_element_type=jnp.float32)
    ctx = ctx * _head_mask(hidden, heads)
    ctx = ctx / (jnp.swapaxes(sk, 1, 2) * float(n))

    qe = jnp.exp(q - jnp.max(q, axis=2, keepdims=True))
    qe = qe.reshape(b, n, heads, dim_head)
    qs = (qe / jnp.sum(qe, axis=3, keepdims=True)).reshape(b, n, hidden)
    qs = qs * scale
    attn = jnp.einsum("bnd,bde->bne", qs.astype(cdt), ctx.astype(cdt),
                      preferred_element_type=jnp.float32)
    o = jnp.einsum("bnd,dc->bnc", attn.astype(cdt), w_out.astype(cdt),
                   preferred_element_type=jnp.float32)
    o = o + b_out.astype(jnp.float32)
    o = cln(o, g_out)
    return (o + x.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _block(x, g_in, w_qkv, w_out, b_out, g_out, heads, dim_head, scale,
           interpret):
    return _fwd_pallas(x, g_in, w_qkv, w_out, b_out, g_out, heads, dim_head,
                       scale, interpret)


def _block_fwd(x, g_in, w_qkv, w_out, b_out, g_out, heads, dim_head, scale,
               interpret):
    out = _fwd_pallas(x, g_in, w_qkv, w_out, b_out, g_out, heads, dim_head,
                      scale, interpret)
    return out, (x, g_in, w_qkv, w_out, b_out, g_out)


def _block_bwd(heads, dim_head, scale, interpret, res, g):
    x, g_in, w_qkv, w_out, b_out, g_out = res
    # Gradients via the jnp reference: XLA fuses the transposed contractions
    # fine (the forward's relayout problem does not exist in reverse), and
    # the recomputed forward is cheap next to the backward matmuls.
    ref = functools.partial(prenorm_linear_attention_reference,
                            heads=heads, dim_head=dim_head, scale=scale)
    _, vjp = jax.vjp(ref, x, g_in, w_qkv, w_out, b_out, g_out)
    return vjp(g)


_block.defvjp(_block_fwd, _block_bwd)


def fits_vmem(n: int, c: int, heads: int = 4, dim_head: int = 32) -> bool:
    """Whether one batch element's slab chain fits the kernel's VMEM budget
    — the single source of truth for the shape dispatch, so the on-chip
    kernel gate (scripts/kernel_check.py) can assert the fused path is
    actually exercised. The estimate counts the dominant fp32 slabs live
    at the context matmul (x, qkv, and the normalized-q/attn pair):
    4·N·(2C + 8H) bytes with H = heads·dim_head. Calibration anchor: the
    128² UNet's widest stage (N=16384, C=64, H=128) demands ~75 MB and
    compiles under the 100 MB scoped-vmem budget (shipping since round 2);
    256²'s widest stage (N=65536) demands ~300 MB and must fall back."""
    hidden = heads * dim_head
    est = 4 * n * (2 * c + 8 * hidden)
    return est <= 100 * 1024 * 1024


def prenorm_linear_attention(
    x: Array, g_in: Array, w_qkv: Array, w_out: Array, b_out: Array,
    g_out: Array, *, heads: int = 4, dim_head: int = 32,
    scale: Optional[float] = None, interpret: Optional[bool] = None,
) -> Array:
    """Fused Residual(PreNorm(LinearAttention)) block over (B, N, C).

    Weights arrive in matmul layout: ``w_qkv`` (C, 3*heads*dim_head),
    ``w_out`` (heads*dim_head, C); gains/bias are (C,). Returns (B, N, C)
    in the input dtype. On non-TPU backends — or when the per-element
    slab chain cannot fit VMEM (``fits_vmem``, e.g. the 256² UNet's
    widest stage) — dispatches to the jnp reference path.
    """
    if scale is None:
        scale = dim_head ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret or not fits_vmem(x.shape[1], x.shape[2], heads, dim_head):
        return prenorm_linear_attention_reference(
            x, g_in, w_qkv, w_out, b_out, g_out,
            heads=heads, dim_head=dim_head, scale=scale)
    return _block(x, g_in, w_qkv, w_out, b_out, g_out, heads, dim_head,
                  float(scale), False)


def prenorm_linear_attention_interpret(
    x: Array, g_in: Array, w_qkv: Array, w_out: Array, b_out: Array,
    g_out: Array, *, heads: int = 4, dim_head: int = 32,
    scale: Optional[float] = None,
) -> Array:
    """Force the Pallas kernel through the interpreter (for CPU tests)."""
    if scale is None:
        scale = dim_head ** -0.5
    return _block(x, g_in, w_qkv, w_out, b_out, g_out, heads, dim_head,
                  float(scale), True)
