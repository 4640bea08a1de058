"""Blockwise (flash-style) cosine-similarity attention Pallas kernel.

The reference's mid-stage Attention (models/unet_model.py:213-241) is
quadratic softmax attention over l2-normalized q/k with a fixed scale of
16. At 128² inputs the mid sequence is only 16·16=256 tokens, but the
quadratic cost is what caps resolution scaling (SURVEY §5: 256² → N=1024,
512² → N=4096). This kernel computes it blockwise with the online-softmax
recurrence so the N×N score matrix never materializes in HBM, with the
l2 normalization fused in.

Layout: the kernel works in (d, N) — sequence in the 128-lane dimension,
head dim (32) in sublanes. The naive (N, d) layout puts d=32 in lanes,
which Mosaic pads 4× and keeps whole arrays VMEM-resident (observed
VMEM OOM at N=4096). Scores are (Bq, Bk) tiles — both MXU-friendly.

Forward is the Pallas kernel; the backward pass recomputes through the
jnp reference implementation's VJP (same math, exact gradients) —
attention is a tiny fraction of this model's FLOPs, so a fused backward
kernel is not worth the complexity.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _row_norms(x: Array, eps: float = 1e-12) -> Array:
    """Per-channel l2 norms over the sequence axis of a (d, N) row — the
    reference normalizes q/k over the SPATIAL dim (its (b,h,d,n) layout,
    F.normalize(dim=-1), models/unet_model.py:21-23,234)."""
    return jnp.maximum(jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True)), eps)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                  block_q: int, block_k: int):
    # all refs: (1, d, N). One (batch*head) row per program; the q axis is
    # tiled by an inner loop (not a second grid dim — a 2D grid made the
    # axon AOT path constrain whole operands to VMEM and OOM).
    d = q_ref.shape[1]
    n = k_ref.shape[2]
    bq, bk = block_q, block_k
    # spatial-axis norms need the whole row; rows are VMEM-resident anyway
    qn = _row_norms(q_ref[0].astype(jnp.float32))             # (d, 1)
    kn = _row_norms(k_ref[0].astype(jnp.float32))

    def outer(i, _):
        q = (
            q_ref[0, :, pl.ds(i * bq, bq)].astype(jnp.float32) / qn
        ) * scale                                             # (d, Bq)

        def inner(j, carry):
            acc, m, l = carry
            kb = k_ref[0, :, pl.ds(j * bk, bk)].astype(jnp.float32) / kn
            vb = v_ref[0, :, pl.ds(j * bk, bk)].astype(jnp.float32)
            # s[a, b] = sum_d q[d, a] k[d, b]. precision=HIGHEST: default MXU
            # precision truncates the f32 operands to bf16; with scale=16 the
            # exp() amplifies that into 7e-4 output error vs the true-f32 jnp
            # reference (caught by scripts/kernel_check.py on-chip).
            s = jax.lax.dot_general(
                q, kb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (Bq, Bk)
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)                            # (Bq, Bk)
            alpha = jnp.exp(m - m_new)                        # (Bq, 1)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            # acc[e, a] = acc[e, a]*alpha[a] + sum_b v[e, b] p[a, b]
            pv = jax.lax.dot_general(
                vb, p, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (d, Bq)
            return acc * alpha.reshape(1, bq) + pv, m_new, l

        acc, m, l = jax.lax.fori_loop(
            0, pl.cdiv(n, bk),
            inner,
            (
                jnp.zeros((d, bq), jnp.float32),
                jnp.full((bq, 1), NEG_INF, jnp.float32),
                jnp.zeros((bq, 1), jnp.float32),
            ),
        )
        o_ref[0, :, pl.ds(i * bq, bq)] = (acc / l.reshape(1, bq)).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, pl.cdiv(n, bq), outer, 0)


def _pick_block(n: int, target: int) -> int:
    """Largest divisor of n that is <= target. The fori_loop tiles use
    fixed-size pl.ds slices, so a non-divisor block would read/write past
    the row end (cdiv overrun) and corrupt the online softmax."""
    for d in range(min(target, n), 0, -1):
        if n % d == 0:
            return d
    return n


def _flash_pallas(q, k, v, scale: float, block_q: int, block_k: int, interpret: bool):
    """q, k, v: (BH, d, N)."""
    bh, d, n = q.shape
    spec = pl.BlockSpec((1, d, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale,
            block_q=_pick_block(n, block_q), block_k=_pick_block(n, block_k),
        ),
        out_shape=jax.ShapeDtypeStruct((bh, d, n), q.dtype),
        grid=(bh,),
        in_specs=[spec] * 3,
        out_specs=spec,
        interpret=interpret,
        # the default 16M scoped-vmem budget under-counts reuse of the
        # loop-tile intermediates; raise it (verified OK on v5e)
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n * n * d,
            bytes_accessed=4 * bh * n * d * 4,
            transcendentals=bh * n * n,
        ),
    )(q, k, v)


def cosine_attention_reference(q: Array, k: Array, v: Array, scale: float) -> Array:
    """jnp reference: l2norm q/k over the SPATIAL axis (the reference's
    F.normalize(dim=-1) on a (b,h,d,n) layout, models/unet_model.py:21-23),
    scaled dot product over d, softmax over keys
    (models/unet_model.py:230-239). Layout here: (BH, N, d)."""
    def l2n(x):  # normalize over N (axis -2 in this layout)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-2, keepdims=True), 1e-12)

    qf = l2n(q.astype(jnp.float32)) * scale
    kf = l2n(k.astype(jnp.float32))
    # precision="highest": keep this reference true-f32 on the MXU (default
    # precision truncates operands to bf16), matching the kernel's dots so
    # the on-chip gate compares two honest f32 implementations.
    sim = jnp.einsum("bid,bjd->bij", qf, kf, precision="highest")
    attn = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum(
        "bij,bjd->bid", attn, v.astype(jnp.float32), precision="highest"
    ).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_bhdn(q, k, v, scale: float, interpret: bool):
    return _flash_pallas(q, k, v, scale, 512, 512, interpret)


def _flash_fwd(q, k, v, scale, interpret):
    return _flash_pallas(q, k, v, scale, 512, 512, interpret), (q, k, v)


def _flash_bwd(scale, interpret, res, g):
    q, k, v = res  # (BH, d, N)
    t = lambda x: x.transpose(0, 2, 1)

    def ref(a, b, c):
        return t(cosine_attention_reference(t(a), t(b), t(c), scale))

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


_flash_bhdn.defvjp(_flash_fwd, _flash_bwd)


def flash_cosine_attention(
    q: Array, k: Array, v: Array, scale: float, interpret: Optional[bool] = None
) -> Array:
    """(B, heads, N, d) fused blockwise attention; falls back to the jnp
    reference path off-TPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, n, d = q.shape
    if interpret:
        flat = lambda t: t.reshape(b * h, n, d)
        return cosine_attention_reference(flat(q), flat(k), flat(v), scale).reshape(
            b, h, n, d
        )
    # kernel layout (BH, d, N). The optimization barrier materializes the
    # transposes in HBM: otherwise XLA folds them into the custom call's
    # operand layouts, which forces the WHOLE operands into VMEM
    # (observed scoped-vmem OOM at N>=1024).
    to_dn = lambda t: t.reshape(b * h, n, d).transpose(0, 2, 1)
    qd, kd, vd = jax.lax.optimization_barrier((to_dn(q), to_dn(k), to_dn(v)))
    out = _flash_bhdn(qd, kd, vd, float(scale), False)
    return out.transpose(0, 2, 1).reshape(b, h, n, d)


def flash_cosine_attention_interpret(q, k, v, scale: float):
    """Force the Pallas kernel through the interpreter (CPU tests)."""
    b, h, n, d = q.shape
    to_dn = lambda t: t.reshape(b * h, n, d).transpose(0, 2, 1)
    out = _flash_bhdn(to_dn(q), to_dn(k), to_dn(v), float(scale), True)
    return out.transpose(0, 2, 1).reshape(b, h, n, d)
