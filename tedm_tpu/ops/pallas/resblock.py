"""Fully-fused ResnetBlock Pallas kernel.

The UNet's workhorse block (reference: models/unet_model.py:119-175) is

    h   = conv3x3(x) ; h = SiLU(FiLM(GroupNorm8(h)))      # Block 1
    h   = conv3x3(h) ; h = SiLU(GroupNorm8(h))            # Block 2
    out = h + res_conv1x1(x)                              # residual

The round-2 profile of the bf16 batch-8 forward (after the fused
attention block landed, 7.9 ms total) still shows ~5.0 ms of
"convolution fusions" against a 2.4 ms MXU floor plus ~2.2 ms of
elementwise loop fusions: every GroupNorm pays a standalone statistics
traversal between the convs, and the conv outputs round-trip through HBM
three times per block. The HBM floor of the whole chain is one read of x
and one write of out (plus weights).

This kernel runs the entire block per batch element in VMEM:

* the 3x3 convs are NINE shifted (N, Cin) @ (Cin, Cout) MXU matmuls over
  the flattened spatial axis — the dy shift is a whole-row (W-element)
  offset into a zero-padded flat slab, the dx shift a +/-1 element offset
  whose row-boundary wraparound is zeroed by a per-column mask (a (N, 1)
  iota compare; the 6 masked taps cost one VPU multiply each);
* matmuls run in the model's compute dtype with fp32 accumulation
  (`preferred_element_type`); fp32 operands additionally force
  `Precision.HIGHEST` — the MXU's default single-pass bf16 truncation
  measured up to 1.8e-3 fwd error vs XLA's multi-pass fp32 convs on the
  on-chip gate (KERNELS.json r2), so the fp32 path is made fp32-exact
  while bf16 (the production sampling dtype) keeps the default;
* GroupNorm statistics are fp32 over the resident fp32 conv accumulator
  (one sum + one sum-of-squares over rows, folded per-channel with the
  constant group-membership matmul at HIGHEST precision — the MXU's
  default precision truncates f32 operands to bf16, which the on-chip
  gate caught on the groupnorm kernel, ops/pallas/groupnorm.py:66-78);
* FiLM scale/shift arrive per batch row as (B, C) blocks and the kernel
  slices its own row (a (1, C) tile of a (B, C) array is not a legal TPU
  block shape).

The backward pass is ``jax.vjp`` over the jnp reference composition —
training gradients take the exact XLA path they take today; the fused
kernel accelerates the forward leg (the sampling loop's cost).

On CPU the public entrypoint falls back to the jnp reference (identical
math) so tests and the virtual-device mesh run anywhere.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tedm_tpu.ops.pallas.groupnorm import _group_matrix


def _conv9(xflat: Array, w9: Array, width: int, cdt) -> Array:
    """3x3 SAME conv over a flattened (N, Cin) slab as 9 shifted matmuls.

    ``xflat`` (N, Cin) in compute dtype; ``w9`` (9, Cin, Cout); ``width``
    the spatial W (N = H * W). Returns the fp32 accumulator (N, Cout).
    """
    n, cin = xflat.shape
    cout = w9.shape[2]
    pad = jnp.zeros((width + 1, cin), cdt)
    xp = jnp.concatenate([pad, xflat, pad], axis=0)  # (N + 2W + 2, Cin)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) % width
    prec = _mxu_precision(cdt)

    # The 9 taps are unrolled in Python: every slice offset and the weight
    # index are then STATIC, which is required — Mosaic TC has no lowering
    # for dynamic_slice with a traced start (the on-chip gate caught the
    # fori_loop version failing to compile). Each tap's slab is consumed by
    # its matmul immediately, so the unroll does not grow live VMEM.
    acc = jnp.zeros((n, cout), jnp.float32)
    for t in range(9):
        dy = t // 3
        dx = t % 3
        # output i reads input flat index i + (dy-1)*W + (dx-1); +W+1 pad off
        off = (dy - 1) * width + (dx - 1) + width + 1
        slab = jax.lax.slice(xp, (off, 0), (off + n, cin))
        # zero the row-boundary wraparound of the dx shift (and the parts of
        # the dy pad the dx offset slid into view)
        if dx == 1:
            masked = slab
        else:
            c = col + (dx - 1)
            mask = ((c >= 0) & (c <= width - 1)).astype(cdt)
            masked = slab * mask
        acc = acc + jax.lax.dot_general(
            masked, w9[t].astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
    return acc


def fits_vmem(h: int, w: int, cin: int, cout: int, dtype) -> bool:
    """Whole-slab VMEM fit predicate: one batch element's activations must
    fit the per-core VMEM. Estimate with 128-lane padding (input slab +
    padded copy + two fp32 accumulators + normalized intermediate +
    residual), then scale by the empirical 2.5× Mosaic stack factor:
    fp32 at 128²/64ch estimates ~50 MB this way but Mosaic's scoped-vmem
    check reports 124.5 MB actual demand (caught by the CLI debug drive
    on-chip). Beyond the 105 MB guard (fp32 at 128², anything at 256²+)
    the caller falls back to XLA rather than fail at compile time."""
    lanes = lambda c: ((c + 127) // 128) * 128
    n_est = h * w
    itemsize = jnp.dtype(dtype).itemsize
    est = (n_est * lanes(cin) * (itemsize * 2)          # x + xp
           + n_est * lanes(cout) * (4 * 3 + itemsize)   # accs/res/h1n
           + 4 * 9 * (cin * cout + cout * cout))        # weights
    return int(est * 2.5) <= 105 * 1024 * 1024


def _mxu_precision(cdt):
    """fp32 operands must NOT take the MXU's default single-pass bf16
    truncation: the on-chip gate measured up to 1.8e-3 fwd error vs the
    XLA reference at 512 channels (XLA's fp32 convs lower to multi-pass).
    HIGHEST makes the fp32 path fp32-exact; bf16 keeps the default."""
    return (jax.lax.Precision.HIGHEST
            if jnp.dtype(cdt) == jnp.float32 else None)


def _gn_film_silu_val(h: Array, gamma: Array, beta: Array, film_a,
                      film_b, groups: int, eps: float) -> Array:
    """GroupNorm + optional FiLM + SiLU on a resident fp32 (N, C) value.
    ``film_a``/``film_b`` are (1, C) fp32 rows (scale+1, shift) or None."""
    n, c = h.shape
    m = _group_matrix(c, groups)
    cnt = float(n * (c // groups))
    s = jnp.sum(h, axis=0, keepdims=True)
    q = jnp.sum(h * h, axis=0, keepdims=True)
    mean = jax.lax.dot_general(
        s, m, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) / cnt
    ex2 = jax.lax.dot_general(
        q, m, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) / cnt
    rstd = jax.lax.rsqrt(jnp.maximum(ex2 - mean * mean, 0.0) + eps)
    y = (h - mean) * rstd * gamma + beta
    if film_a is not None:
        y = y * film_a + film_b
    return y * jax.nn.sigmoid(y)


def _kernel(x_ref, w1_ref, b1_ref, g1_ref, be1_ref, s_ref, sh_ref,
            w2_ref, b2_ref, g2_ref, be2_ref, wres_ref, bres_ref, o_ref, *,
            width: int, groups: int, eps: float, has_res: bool,
            has_film: bool):
    cdt = x_ref.dtype
    cout = o_ref.shape[2]
    x = x_ref[0]                                     # (N, Cin), compute dtype

    h = _conv9(x, w1_ref[0], width, cdt) + b1_ref[0].reshape(1, cout)
    if has_film:
        pid = pl.program_id(0)
        fa = s_ref[pl.ds(pid, 1), :] + 1.0           # (1, C) fp32
        fb = sh_ref[pl.ds(pid, 1), :]
    else:
        fa = fb = None
    h = _gn_film_silu_val(h, g1_ref[0].reshape(1, cout),
                          be1_ref[0].reshape(1, cout), fa, fb, groups, eps)

    h = _conv9(h.astype(cdt), w2_ref[0], width, cdt) + b2_ref[0].reshape(1, cout)
    h = _gn_film_silu_val(h, g2_ref[0].reshape(1, cout),
                          be2_ref[0].reshape(1, cout), None, None, groups, eps)

    if has_res:
        res = jax.lax.dot_general(
            x, wres_ref[0].astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_mxu_precision(cdt),
        ) + bres_ref[0].reshape(1, cout)
    else:
        res = x.astype(jnp.float32)
    o_ref[0] = (h + res).astype(o_ref.dtype)


def _param_spec(shape):
    return pl.BlockSpec((1,) + shape, lambda i: (0,) * (len(shape) + 1),
                        memory_space=pltpu.VMEM)


def _fwd_pallas(x3, w1, b1, g1, be1, scale, shift, w2, b2, g2, be2,
                wres, bres, width, groups, eps, has_res, has_film, interpret):
    b, n, cin = x3.shape
    cout = w1.shape[2]
    slab_in = pl.BlockSpec((1, n, cin), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    slab_out = pl.BlockSpec((1, n, cout), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    per_b = pl.BlockSpec((b, cout), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, width=width, groups=groups, eps=eps,
                          has_res=has_res, has_film=has_film),
        out_shape=jax.ShapeDtypeStruct((b, n, cout), x3.dtype),
        grid=(b,),
        in_specs=[
            slab_in,
            _param_spec((9, cin, cout)), _param_spec((cout,)),
            _param_spec((cout,)), _param_spec((cout,)),
            per_b, per_b,
            _param_spec((9, cout, cout)), _param_spec((cout,)),
            _param_spec((cout,)), _param_spec((cout,)),
            _param_spec((cin, cout)), _param_spec((cout,)),
        ],
        out_specs=slab_out,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (9 * cin * cout + 9 * cout * cout + cin * cout),
            bytes_accessed=b * n * (cin + cout) * x3.dtype.itemsize
            + 4 * (9 * cin * cout + 9 * cout * cout + cin * cout),
            transcendentals=2 * b * n * cout,
        ),
    )(x3, w1[None], b1[None], g1[None], be1[None], scale, shift,
      w2[None], b2[None], g2[None], be2[None], wres[None], bres[None])


# ---------------------------------------------------------------- jnp path


def resnet_block_reference(
    x: Array, w1: Array, b1: Array, g1: Array, be1: Array,
    scale: Optional[Array], shift: Optional[Array],
    w2: Array, b2: Array, g2: Array, be2: Array,
    wres: Optional[Array], bres: Optional[Array],
    *, groups: int = 8, eps: float = 1e-5,
) -> Array:
    """jnp reference of the whole block on NHWC — the single source of
    truth for the math; the Pallas kernel is tested against it and the
    backward pass differentiates through it. Convs are XLA
    `conv_general_dilated` in the compute dtype with fp32 accumulation
    (the same contraction the kernel's 9 shifted matmuls compute);
    GroupNorm statistics are fp32 E[x²]−μ² (the one-pass form, see
    ops/pallas/groupnorm.py:155-163)."""
    bsz, h, w, cin = x.shape
    cout = w1.shape[-1]
    cdt = x.dtype

    def conv(inp, kern):
        return jax.lax.conv_general_dilated(
            inp.astype(cdt), kern.astype(cdt), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
            precision=_mxu_precision(cdt),
        )

    def gn(t, gamma, beta, fa, fb):
        tf = t.reshape(bsz, h * w, groups, cout // groups)
        mean = tf.mean(axis=(1, 3), keepdims=True)
        ex2 = (tf * tf).mean(axis=(1, 3), keepdims=True)
        rstd = jax.lax.rsqrt(jnp.maximum(ex2 - mean * mean, 0.0) + eps)
        y = ((tf - mean) * rstd).reshape(bsz, h, w, cout) * gamma + beta
        if fa is not None:
            y = y * fa[:, None, None, :] + fb[:, None, None, :]
        return y * jax.nn.sigmoid(y)

    hh = conv(x, w1) + b1.astype(jnp.float32)
    fa = None if scale is None else scale.astype(jnp.float32) + 1.0
    fb = None if shift is None else shift.astype(jnp.float32)
    hh = gn(hh, g1.astype(jnp.float32), be1.astype(jnp.float32), fa, fb)
    hh = conv(hh.astype(cdt), w2) + b2.astype(jnp.float32)
    hh = gn(hh, g2.astype(jnp.float32), be2.astype(jnp.float32), None, None)
    if wres is not None:
        res = jnp.einsum("bhwc,cd->bhwd", x.astype(cdt), wres.astype(cdt),
                         preferred_element_type=jnp.float32,
                         precision=_mxu_precision(cdt))
        res = res + bres.astype(jnp.float32)
    else:
        res = x.astype(jnp.float32)
    return (hh + res).astype(x.dtype)


# ------------------------------------------------------------------ dispatch


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17))
def _block(x3, w1, b1, g1, be1, scale, shift, w2, b2, g2, be2, wres, bres,
           width, groups, eps, has_res, interpret):
    return _fwd_pallas(x3, w1, b1, g1, be1, scale, shift, w2, b2, g2, be2,
                       wres, bres, width, groups, eps, has_res, True,
                       interpret)


def _block_fwd(x3, w1, b1, g1, be1, scale, shift, w2, b2, g2, be2, wres,
               bres, width, groups, eps, has_res, interpret):
    out = _fwd_pallas(x3, w1, b1, g1, be1, scale, shift, w2, b2, g2, be2,
                      wres, bres, width, groups, eps, has_res, True,
                      interpret)
    return out, (x3, w1, b1, g1, be1, scale, shift, w2, b2, g2, be2, wres,
                 bres)


def _block_bwd(width, groups, eps, has_res, interpret, res, g):
    (x3, w1, b1, g1, be1, scale, shift, w2, b2, g2, be2, wres, bres) = res
    b, n, cin = x3.shape

    def ref(x3_, w1_, b1_, g1_, be1_, sc_, sh_, w2_, b2_, g2_, be2_, wr_, br_):
        x4 = x3_.reshape(b, n // width, width, cin)
        out = resnet_block_reference(
            x4, w1_.reshape(3, 3, *w1_.shape[1:]), b1_, g1_, be1_, sc_, sh_,
            w2_.reshape(3, 3, *w2_.shape[1:]), b2_, g2_, be2_,
            wr_ if has_res else None, br_ if has_res else None,
            groups=groups, eps=eps)
        return out.reshape(b, n, -1)

    # unused inputs (wres/bres when the residual is identity) get zero
    # cotangents from jax.vjp automatically
    _, vjp = jax.vjp(ref, x3, w1, b1, g1, be1, scale, shift, w2, b2, g2,
                     be2, wres, bres)
    return vjp(g)


_block.defvjp(_block_fwd, _block_bwd)


def uses_fused_kernel(
    h: int, w: int, cin: int, cout: int, dtype,
    *, groups: int = 8, min_c: Optional[int] = None,
) -> bool:
    """Whether ``fused_resnet_block`` would take the Pallas path for this
    shape — the single source of truth for the dispatch decision, so the
    on-chip kernel gate (scripts/kernel_check.py) can assert the fused path
    is actually exercised rather than comparing the XLA fallback to itself."""
    if min_c is None:
        min_c = int(os.environ.get("TEDM_RESBLOCK_MIN_C", "0"))
    return (cout % groups == 0 and min(cin, cout) >= min_c
            and fits_vmem(h, w, cin, cout, dtype))


def fused_resnet_block(
    x: Array, w1: Array, b1: Array, g1: Array, be1: Array,
    scale: Optional[Array], shift: Optional[Array],
    w2: Array, b2: Array, g2: Array, be2: Array,
    wres: Optional[Array] = None, bres: Optional[Array] = None,
    *, groups: int = 8, eps: float = 1e-5, interpret: Optional[bool] = None,
    min_c: Optional[int] = None,
) -> Array:
    """Fused conv3x3 → GN+FiLM+SiLU → conv3x3 → GN+SiLU → +res over NHWC.

    ``x`` (B, H, W, Cin); ``w1`` (3, 3, Cin, Cout), ``w2`` (3, 3, Cout,
    Cout), ``wres`` (Cin, Cout) 1x1 kernel or None when Cin == Cout
    (identity residual); ``scale``/``shift`` (B, Cout) FiLM rows or None;
    gains/biases (Cout,). Returns (B, H, W, Cout) in the input dtype. On
    non-TPU backends dispatches to the jnp reference path.
    """
    b, h, w, cin = x.shape
    cout = w1.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
        if interpret:
            return resnet_block_reference(
                x, w1, b1, g1, be1, scale, shift, w2, b2, g2, be2, wres,
                bres, groups=groups, eps=eps)
    # Narrow stages starve the MXU in the 9-shifted-matmul decomposition
    # (K = N = 64 at the 128² stage is <=25% lane utilization; XLA's conv
    # packs those better) — min_c gates the kernel to wide stages for A/B
    # measurement (scripts/bench_resblock.py). Pass it explicitly; the
    # TEDM_RESBLOCK_MIN_C env fallback is read at TRACE time, so changing
    # the env after a caller's jit has traced has no effect.
    if not uses_fused_kernel(h, w, cin, cout, x.dtype, groups=groups, min_c=min_c):
        return resnet_block_reference(
            x, w1, b1, g1, be1, scale, shift, w2, b2, g2, be2, wres, bres,
            groups=groups, eps=eps)
    has_res = wres is not None
    has_film = scale is not None
    if not has_film:
        scale = jnp.zeros((b, cout), jnp.float32)
        shift = jnp.zeros((b, cout), jnp.float32)
    if not has_res:
        wres = jnp.zeros((cin, cout), jnp.float32)
        bres = jnp.zeros((cout,), jnp.float32)
    out = _block(
        x.reshape(b, h * w, cin),
        w1.reshape(9, cin, cout), b1.astype(jnp.float32),
        g1.astype(jnp.float32), be1.astype(jnp.float32),
        scale.astype(jnp.float32), shift.astype(jnp.float32),
        w2.reshape(9, cout, cout), b2.astype(jnp.float32),
        g2.astype(jnp.float32), be2.astype(jnp.float32),
        wres.reshape(cin, cout), bres.astype(jnp.float32),
        w, groups, eps, has_res, interpret)
    return out.reshape(b, h, w, cout)


def fused_resnet_block_interpret(*args, **kw) -> Array:
    """Force the Pallas kernel through the interpreter (for CPU tests)."""
    return fused_resnet_block(*args, **kw, interpret=True)
