"""The DDPM UNet backbone, TPU-native.

Architectural parity with the reference lucidrains-style UNet
(models/unet_model.py:246-368): init 7x7 conv; 4 down stages of
[ResBlock, ResBlock, Residual(PreNorm(LinearAttention)), Downsample];
mid ResBlock + full Attention + ResBlock; 4 up stages with skip-concat;
final ResBlock over cat(x, init-residual) + 1x1 conv. Golden parameter
count at dim=64, mults (1,2,4,8), channels=1: 36,245,377.

TPU-first design decisions (not translations):
* NHWC layout throughout — the native layout for TPU convolutions.
* Decoder activations are **first-class outputs** (``extract_features=True``)
  instead of the reference's forward hooks + per-call device→host copies
  (models/datasetDM_model.py:16-27). Features never leave the device.
* dtype-polymorphic: params live in fp32, compute dtype is a module
  parameter (bf16 on TPU); normalization statistics always in fp32.
* optional Pallas kernels for fused GroupNorm+FiLM+SiLU and linear
  attention (see tedm_tpu/ops/pallas/).
* ``encode`` / ``run_mid`` / ``decode`` are exposed separately so the
  contrastive models (models/global_local_cl.py in the reference) reuse the
  same parameter tree, enabling partial-checkpoint finetuning.

The ``cond`` argument is accepted and ignored, faithfully mirroring the
reference's (dead) conditional path (models/unet_model.py:333).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from tedm_tpu.ops.resize import nearest_upsample_2x

Dtype = Any


def l2norm(x: Array, axis: int = -1, eps: float = 1e-12) -> Array:
    """F.normalize semantics: x / max(||x||_2, eps)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


# Torch-matched kernel init: torch Conv2d/Linear default to
# kaiming_uniform(a=sqrt(5)) == uniform with variance 1/(3*fan_in) — one
# THIRD the variance of flax's lecun_normal default. Measured decisive for
# low-data generalization (round-2 parity probe): baseline n=1 on the
# parity corpus reached val dice 0.937 with lecun_normal (val loss
# DIVERGING 0.12 -> 0.60 while train loss fit to 3e-4) vs 0.995 with this
# init (val loss 0.033 -> 0.006, matching the torch reference run's
# 0.030 -> 0.004 trajectory exactly). Biases stay zero (flax default) —
# scaling kernels alone closed the whole gap.
_torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def Conv(*args, **kw):
    """nn.Conv with the torch-matched kernel init (see _torch_kernel_init)."""
    kw.setdefault("kernel_init", _torch_kernel_init)
    return nn.Conv(*args, **kw)


def Dense(*args, **kw):
    """nn.Dense with the torch-matched kernel init."""
    kw.setdefault("kernel_init", _torch_kernel_init)
    return nn.Dense(*args, **kw)


class ChanLayerNorm(nn.Module):
    """Channel-wise biasless LayerNorm (reference: models/unet_model.py:52-61).

    Normalizes over the channel axis per spatial position with *biased*
    variance, learnable gain only. eps=1e-5 in fp32 (1e-3 otherwise).
    """

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        g = self.param("g", nn.initializers.ones, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        eps = 1e-5
        out = (xf - mean) * jax.lax.rsqrt(var + eps) * g
        return out.astype(self.dtype)


class SinusoidalPosEmb(nn.Module):
    """Classical sinusoidal timestep embedding (reference: models/unet_model.py:76-93)."""

    dim: int

    def __call__(self, t: Array) -> Array:
        half_dim = self.dim // 2
        emb = math.log(10000.0) / (half_dim - 1)
        emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
        emb = t.astype(jnp.float32)[:, None] * emb[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class TimeMLP(nn.Module):
    """SinusoidalPosEmb -> Dense(4*dim) -> GELU(exact) -> Dense(4*dim)
    (reference: models/unet_model.py:287-292)."""

    dim: int
    time_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: Array) -> Array:
        x = SinusoidalPosEmb(self.dim)(t)
        x = Dense(self.time_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = Dense(self.time_dim, dtype=self.dtype, name="fc2")(x)
        return x


class GNFilmSiLU(nn.Module):
    """GroupNorm -> optional FiLM -> SiLU with the same param tree as
    flax ``nn.GroupNorm`` (leaves ``scale``/``bias`` of shape (C,), so
    checkpoints and the torch port are oblivious to the fusion).

    With ``use_pallas`` the whole chain runs as ONE Pallas kernel (one HBM
    read + one write; see ops/pallas/groupnorm.py). Measured on v5e at
    128²/batch-8 the kernel wins its own battle (1.5 ms vs 3.7 ms of XLA
    stats reduces across all 38 norms) but loses the war: the pallas call
    boundaries break XLA's surrounding elementwise fusions (+2.8 ms fusion,
    +0.5 ms copy, net 9.9 -> 13.6 ms fwd) — hence OPT-IN
    (``Unet.use_pallas_groupnorm``), mirroring the flash-attention policy.
    """

    groups: int = 8
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: Array, scale_shift: Optional[Tuple[Array, Array]] = None) -> Array:
        c = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        from tedm_tpu.ops.pallas.groupnorm import (
            fused_group_norm_film_silu,
            group_norm_film_silu_reference,
        )

        scale = shift = None
        if scale_shift is not None:
            scale = scale_shift[0].reshape(x.shape[0], c).astype(jnp.float32)
            shift = scale_shift[1].reshape(x.shape[0], c).astype(jnp.float32)
        # one source of truth for the math: the kernel's own jnp reference
        fn = fused_group_norm_film_silu if self.use_pallas else group_norm_film_silu_reference
        return fn(
            x, gamma, beta, scale, shift, groups=self.groups, eps=1e-5
        ).astype(self.dtype)


class Block(nn.Module):
    """Conv3x3 -> GroupNorm(8) -> optional FiLM (x*(scale+1)+shift) -> SiLU
    (reference: models/unet_model.py:119-135)."""

    dim_out: int
    groups: int = 8
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: Array, scale_shift: Optional[Tuple[Array, Array]] = None) -> Array:
        x = Conv(self.dim_out, (3, 3), padding="SAME", dtype=self.dtype, name="proj")(x)
        return GNFilmSiLU(
            self.groups, self.dtype, self.use_pallas, name="norm"
        )(x, scale_shift)


class ResnetBlock(nn.Module):
    """Two FiLM-conditioned Blocks with a residual 1x1 projection
    (reference: models/unet_model.py:138-175).

    With ``use_pallas_resblock`` the WHOLE block — conv3x3 → GN+FiLM+SiLU →
    conv3x3 → GN+SiLU → +res_conv(x) — runs as ONE Pallas kernel
    (ops/pallas/resblock.py): one HBM read of x, one write of out, no
    standalone GroupNorm statistics traversals between the convs. The
    param tree is identical in both paths (only the time MLP runs
    outside the kernel)."""

    dim: int
    dim_out: int
    time_emb_dim: Optional[int] = None
    groups: int = 8
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    use_pallas_resblock: bool = False

    @nn.compact
    def __call__(self, x: Array, time_emb: Optional[Array] = None) -> Array:
        scale_shift = None
        if self.time_emb_dim is not None and time_emb is not None:
            temb = nn.silu(time_emb)
            temb = Dense(self.dim_out * 2, dtype=self.dtype, name="time_proj")(temb)
            temb = temb[:, None, None, :]  # (B,1,1,2C)
            scale_shift = (temb[..., : self.dim_out], temb[..., self.dim_out :])

        if self.use_pallas_resblock:
            from tedm_tpu.ops.pallas.resblock import fused_resnet_block

            in_c = x.shape[-1]
            w1, b1, g1, be1 = _BlockParams(self.dim_out, in_c, name="block1")()
            w2, b2, g2, be2 = _BlockParams(self.dim_out, self.dim_out,
                                           name="block2")()
            wres = bres = None
            if self.dim != self.dim_out:
                kres, bres = _ConvParams(self.dim_out, in_c,
                                         name="res_conv")()
                wres = kres.reshape(in_c, self.dim_out)
            scale = shift = None
            if scale_shift is not None:
                b_ = x.shape[0]
                scale = scale_shift[0].reshape(b_, self.dim_out)
                shift = scale_shift[1].reshape(b_, self.dim_out)
            return fused_resnet_block(
                x.astype(self.dtype), w1, b1, g1, be1, scale, shift,
                w2, b2, g2, be2, wres, bres, groups=self.groups,
            ).astype(self.dtype)

        h = Block(self.dim_out, self.groups, self.dtype, self.use_pallas,
                  name="block1")(x, scale_shift)
        h = Block(self.dim_out, self.groups, self.dtype, self.use_pallas,
                  name="block2")(h)
        if self.dim != self.dim_out:
            res = Conv(self.dim_out, (1, 1), dtype=self.dtype, name="res_conv")(x)
        else:
            res = x
        return h + res


class _ConvParams(nn.Module):
    """Declares the exact param tree of an ``nn.Conv`` without running it
    (same names, shapes, dtypes, and initializers — so the fused-attention
    and fused-resblock paths below are parameter-identical to the unfused
    module chain)."""

    features: int
    in_features: int
    use_bias: bool = True
    ksize: int = 1

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", _torch_kernel_init,
            (self.ksize, self.ksize, self.in_features, self.features),
            jnp.float32,
        )
        if not self.use_bias:
            return kernel, None
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        return kernel, bias


class _GNParams(nn.Module):
    """Declares GNFilmSiLU's scale/bias params (same paths/inits)."""

    dim: int

    @nn.compact
    def __call__(self):
        gamma = self.param("scale", nn.initializers.ones, (self.dim,),
                           jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (self.dim,),
                          jnp.float32)
        return gamma, beta


class _BlockParams(nn.Module):
    """Declares the exact param tree of a ``Block`` (conv3x3 'proj' +
    GNFilmSiLU 'norm') without running it — the fused-resblock path."""

    dim_out: int
    in_features: int

    @nn.compact
    def __call__(self):
        w, b = _ConvParams(self.dim_out, self.in_features, ksize=3,
                           name="proj")()
        gamma, beta = _GNParams(self.dim_out, name="norm")()
        return w, b, gamma, beta


class _GainParams(nn.Module):
    """Declares ChanLayerNorm's single gain param (same path/init)."""

    dim: int

    @nn.compact
    def __call__(self):
        return self.param("g", nn.initializers.ones, (self.dim,), jnp.float32)


class LinearAttention(nn.Module):
    """O(N) linear attention over spatial positions
    (reference: models/unet_model.py:178-210).

    q is softmaxed over its channel dim, k over positions; the context matrix
    softmax(k)·v is a (d x e) MXU matmul per head. Wrapped with the reference's
    to_out Conv1x1 + ChanLayerNorm.

    With ``use_pallas``, PreNormAttn passes its norm gain down and the WHOLE
    block (pre-norm -> qkv 1x1 -> attention -> to_out 1x1 -> out-norm ->
    residual) runs as ONE Pallas kernel (ops/pallas/attn_block.py): the 1x1
    convs prefer spatial-major layouts while the attention contractions need
    channels minor, so the unfused chain pays full-tensor relayout copies at
    every q/k/v — measured 4.1 ms of the 10.7 ms bf16 batch-8 UNet forward
    on v5e. The param tree is identical in both paths.
    """

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    # 'heads_major' mirrors the reference's 'b (h c) x y -> b h c (x y)'
    # transpose before the einsums; 'nhwc' keeps the conv's native
    # (B, N, heads, d) layout and lets XLA contract in place (no explicit
    # transposes — the copies they lower to cost ~1.2 ms/fwd, profiled).
    layout: str = "heads_major"

    @nn.compact
    def __call__(self, x: Array, prenorm_gain: Optional[Array] = None) -> Array:
        b, h, w, c = x.shape
        hidden = self.heads * self.dim_head

        if prenorm_gain is not None:
            # Fused Residual(PreNorm(attn)) path: x here is the UN-normalized
            # block input; the kernel applies the pre-norm and the residual.
            from tedm_tpu.ops.pallas.attn_block import prenorm_linear_attention

            w_qkv, _ = _ConvParams(hidden * 3, c, use_bias=False, name="to_qkv")()
            w_out, b_out = _ConvParams(self.dim, hidden, name="to_out")()
            g_out = _GainParams(self.dim, name="out_norm")()
            y = prenorm_linear_attention(
                x.reshape(b, h * w, c),
                prenorm_gain,
                w_qkv.reshape(c, hidden * 3),
                w_out.reshape(hidden, self.dim),
                b_out,
                g_out,
                heads=self.heads,
                dim_head=self.dim_head,
                scale=self.dim_head ** -0.5,
            )
            return y.reshape(b, h, w, self.dim)

        qkv = Conv(
            hidden * 3, (1, 1), use_bias=False, dtype=self.dtype, name="to_qkv"
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # (B, H, W, heads*dh) -> (B, heads, dh, N): the reference's
        # 'b (h c) x y -> b h c (x y)' head-major channel split.
        def to_heads(t: Array) -> Array:
            t = t.reshape(b, h * w, self.heads, self.dim_head)
            return t.transpose(0, 2, 3, 1)

        if self.use_pallas:
            from tedm_tpu.ops.pallas.linear_attention import linear_attention

            out = linear_attention(
                to_heads(q), to_heads(k), to_heads(v), scale=self.dim_head**-0.5
            )
            out = out.transpose(0, 3, 1, 2).reshape(b, h, w, hidden)
        elif self.layout == "nhwc":
            # same math, contraction over N in the conv-native layout
            sh = (b, h * w, self.heads, self.dim_head)
            qf = jax.nn.softmax(q.reshape(sh).astype(jnp.float32), axis=3)
            kf = jax.nn.softmax(k.reshape(sh).astype(jnp.float32), axis=1)
            qf = qf * (self.dim_head**-0.5)
            vf = v.reshape(sh).astype(jnp.float32) / (h * w)
            context = jnp.einsum("bnhd,bnhe->bhde", kf, vf)
            out = jnp.einsum("bhde,bnhd->bnhe", context, qf)
            out = out.reshape(b, h, w, hidden)
        else:
            q, k, v = to_heads(q), to_heads(k), to_heads(v)
            qf = jax.nn.softmax(q.astype(jnp.float32), axis=2)  # over d
            kf = jax.nn.softmax(k.astype(jnp.float32), axis=3)  # over n
            qf = qf * (self.dim_head**-0.5)
            vf = v.astype(jnp.float32) / (h * w)
            context = jnp.einsum("bhdn,bhen->bhde", kf, vf)
            out = jnp.einsum("bhde,bhdn->bhen", context, qf)
            out = out.transpose(0, 3, 1, 2).reshape(b, h, w, hidden)

        out = Conv(self.dim, (1, 1), dtype=self.dtype, name="to_out")(out.astype(self.dtype))
        return ChanLayerNorm(self.dim, self.dtype, name="out_norm")(out)


class Attention(nn.Module):
    """Full quadratic attention with cosine-sim logits, fixed scale 16
    (reference: models/unet_model.py:213-241). Runs at the 16x16 mid stage."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    scale: float = 16.0
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        hidden = self.heads * self.dim_head
        qkv = Conv(
            hidden * 3, (1, 1), use_bias=False, dtype=self.dtype, name="to_qkv"
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def to_heads(t: Array) -> Array:  # (B,H,W,hd) -> (B, heads, N, dh)
            return t.reshape(b, h * w, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = to_heads(q), to_heads(k), to_heads(v)
        if self.use_pallas:
            from tedm_tpu.ops.pallas.flash_attention import flash_cosine_attention

            out = flash_cosine_attention(q, k, v, self.scale)  # l2norm fused
        else:
            # The reference l2norm runs over dim=-1 of its (b, h, d, n)
            # layout — i.e. over the SPATIAL axis, not the head dim
            # (models/unet_model.py:21-23,234; verified by weight-port
            # parity). In our (b, heads, n, d) layout that is axis=2.
            q = l2norm(q.astype(jnp.float32), axis=2)
            k = l2norm(k.astype(jnp.float32), axis=2)
            sim = jnp.einsum("bhid,bhjd->bhij", q, k) * self.scale
            attn = jax.nn.softmax(sim, axis=-1)
            out = jnp.einsum("bhij,bhjd->bhid", attn, v.astype(jnp.float32))
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, hidden).astype(self.dtype)
        return Conv(self.dim, (1, 1), dtype=self.dtype, name="to_out")(out)


class Residual(nn.Module):
    fn: nn.Module

    def __call__(self, x: Array, *args, **kwargs) -> Array:
        return self.fn(x, *args, **kwargs) + x


class PreNormAttn(nn.Module):
    """Residual(PreNorm(attn)) as used in every stage
    (reference: models/unet_model.py:29-36, 64-73)."""

    dim: int
    attn: nn.Module
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        fuse = (
            isinstance(self.attn, LinearAttention)
            and getattr(self.attn, "use_pallas", False)
            # The compiled fused kernel holds fp32 (N, 3*hidden) slabs in
            # VMEM; at the 128² stage in fp32 that is ~119 MB > the v5e
            # budget. bf16 (the sampling dtype) fits; fp32 training keeps
            # the per-head linear_attention kernel below. Off-TPU the fused
            # path is the jnp reference, so tests exercise it in fp32 too.
            and (self.dtype == jnp.bfloat16 or jax.default_backend() != "tpu")
        )
        if fuse:
            # Whole block fused into one Pallas kernel (attn_block.py);
            # param tree identical (norm/g declared here, conv/out-norm
            # params declared by stand-ins inside LinearAttention).
            g_in = _GainParams(self.dim, name="norm")()
            return self.attn(x, prenorm_gain=g_in)
        y = ChanLayerNorm(self.dim, self.dtype, name="norm")(x)
        return self.attn(y) + x


class Downsample(nn.Module):
    """Conv 4x4 stride 2 pad 1 (reference: models/unet_model.py:47-49)."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return Conv(
            self.dim_out, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv",
        )(x)


class Upsample(nn.Module):
    """Nearest 2x + conv 3x3 (reference: models/unet_model.py:39-44)."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nearest_upsample_2x(x)
        return Conv(self.dim_out, (3, 3), padding="SAME", dtype=self.dtype, name="conv")(x)


class Unet(nn.Module):
    """The full backbone. See module docstring for parity notes."""

    dim: int = 64
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 1
    resnet_block_groups: int = 8
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    # Linear-attention einsum layout ('heads_major' | 'nhwc'), see
    # LinearAttention.layout. Ignored when use_pallas (kernel has its own).
    attn_layout: str = "heads_major"
    # The fused GroupNorm+FiLM+SiLU kernel is opt-in: its own cost is fine
    # (1.5 ms vs 3.7 ms of XLA stats reduces for all 38 norms, measured
    # on v5e) but the pallas call boundaries break XLA's surrounding
    # elementwise fusions (+2.8 ms fusion, +0.5 ms copy), a net loss at
    # 128²/batch-8. Re-measure before enabling at other shapes.
    use_pallas_groupnorm: bool = False
    # The fused whole-ResnetBlock kernel (conv3x3+GN+FiLM+SiLU twice +
    # residual in ONE kernel, ops/pallas/resblock.py) — unlike the
    # GN-only kernel it introduces no mid-chain fusion boundary.
    use_pallas_resblock: bool = False
    # Route the mid-stage full attention through the fused flash-cosine
    # Pallas kernel (ops/pallas/flash_attention.py; l2norm+softmax+PV in
    # one VMEM-resident pass). Opt-in: measured 2-5x SLOWER than XLA's
    # batched einsum at N=1024..4096 (d=32 contractions underfill the
    # MXU); the mid stage is N=(img/8)^2, so every shape <= 512^2 sits in
    # the measured losing range. Param-tree neutral (the kernel has no
    # extra params) — flip freely on an existing checkpoint.
    use_pallas_flash: bool = False
    # Block-level activation rematerialization: every ResnetBlock and
    # attention block is wrapped in nn.remat, so the backward pass
    # recomputes ONE block at a time and only block-boundary activations
    # stay resident. This — not a whole-model jax.checkpoint — is what
    # makes 512² training fit HBM: checkpointing the whole forward still
    # rematerializes the FULL activation set at once inside the backward
    # (measured: 512² batch-4 OOMs with whole-model checkpoint, the top
    # HLO temps being ~20 live 260 MB fp32 GroupNorm converts; see
    # docs/DESIGN.md "remat granularity"). Param-tree neutral (nn.remat
    # is a lifted transform; names and shapes are unchanged) — flip
    # freely on an existing checkpoint.
    remat: bool = False

    def setup(self) -> None:
        init_dim = self.init_dim if self.init_dim is not None else self.dim
        dims = [init_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        self._in_out = in_out
        time_dim = self.dim * 4
        g = self.resnet_block_groups
        # block-level remat (see the `remat` field note above)
        RB = nn.remat(ResnetBlock) if self.remat else ResnetBlock
        PA = nn.remat(PreNormAttn) if self.remat else PreNormAttn

        self.init_conv = Conv(
            init_dim, (7, 7), padding="SAME", dtype=self.dtype, name="init_conv"
        )
        self.time_mlp = TimeMLP(self.dim, time_dim, self.dtype, name="time_mlp")

        downs = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= len(in_out) - 1
            downs.append(
                (
                    RB(dim_in, dim_in, time_dim, g, self.dtype, self.use_pallas_groupnorm, self.use_pallas_resblock),
                    RB(dim_in, dim_in, time_dim, g, self.dtype, self.use_pallas_groupnorm, self.use_pallas_resblock),
                    PA(
                        dim_in,
                        LinearAttention(dim_in, dtype=self.dtype, use_pallas=self.use_pallas, layout=self.attn_layout),
                        self.dtype,
                    ),
                    Downsample(dim_out, self.dtype)
                    if not is_last
                    else Conv(dim_out, (3, 3), padding="SAME", dtype=self.dtype),
                )
            )
        self.downs = downs

        mid_dim = dims[-1]
        self.mid_block1 = RB(mid_dim, mid_dim, time_dim, g, self.dtype, self.use_pallas_groupnorm, self.use_pallas_resblock)
        # Mid attention defaults to the XLA path: the Pallas flash kernel
        # was measured 2-5x SLOWER on v5e at N=1024..4096 (d=32
        # contractions underfill the MXU), and the predicted ~N>=16k
        # crossover did NOT materialize — at 1024^2 inputs (N=16384) the
        # full fwd is 538.9 ms flash vs 455.8 XLA (BENCH_shapes.jsonl).
        # XLA wins at every shape this framework can ship on one chip;
        # use_pallas_flash remains a measured escape hatch, never default.
        self.mid_attn = PA(
            mid_dim,
            Attention(mid_dim, dtype=self.dtype, use_pallas=self.use_pallas_flash),
            self.dtype,
        )
        self.mid_block2 = RB(mid_dim, mid_dim, time_dim, g, self.dtype, self.use_pallas_groupnorm, self.use_pallas_resblock)

        ups = []
        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == len(in_out) - 1
            ups.append(
                (
                    RB(dim_out + dim_in, dim_out, time_dim, g, self.dtype, self.use_pallas_groupnorm, self.use_pallas_resblock),
                    RB(dim_out + dim_in, dim_out, time_dim, g, self.dtype, self.use_pallas_groupnorm, self.use_pallas_resblock),
                    PA(
                        dim_out,
                        LinearAttention(dim_out, dtype=self.dtype, use_pallas=self.use_pallas, layout=self.attn_layout),
                        self.dtype,
                    ),
                    Upsample(dim_in, self.dtype)
                    if not is_last
                    else Conv(dim_in, (3, 3), padding="SAME", dtype=self.dtype),
                )
            )
        self.ups = ups

        out_dim = self.out_dim if self.out_dim is not None else self.channels
        self.final_res_block = RB(self.dim * 2, self.dim, time_dim, g, self.dtype, self.use_pallas_groupnorm, self.use_pallas_resblock)
        self.final_conv = Conv(out_dim, (1, 1), dtype=self.dtype, name="final_conv")

    # ------------------------------------------------------------- pieces

    def time_embed(self, t: Optional[Array]) -> Optional[Array]:
        return self.time_mlp(t) if t is not None else None

    def encode(self, x: Array, temb: Optional[Array]) -> Tuple[Array, Array, List[Array]]:
        """init_conv + down path. Returns (bottleneck, init_residual, skips)."""
        x = self.init_conv(x)
        r = x
        hs: List[Array] = []
        for block1, block2, attn, downsample in self.downs:
            x = block1(x, temb)
            hs.append(x)
            x = block2(x, temb)
            x = attn(x)
            hs.append(x)
            x = downsample(x)
        return x, r, hs

    def run_mid(self, x: Array, temb: Optional[Array]) -> Array:
        x = self.mid_block1(x, temb)
        x = self.mid_attn(x)
        return self.mid_block2(x, temb)

    def decode(
        self,
        x: Array,
        r: Array,
        hs: List[Array],
        temb: Optional[Array],
        collect_features: bool = False,
        n_stages: Optional[int] = None,
    ) -> Tuple[Array, List[Array]]:
        """Up path. With ``collect_features``, also returns the post-attention
        map of every up stage — the reference's hooked activations
        (models/datasetDM_model.py:50-53): [512@16², 256@32², 128@64², 64@128²]
        at default dims."""
        hs = list(hs)
        feats: List[Array] = []
        stages = self.ups if n_stages is None else self.ups[:n_stages]
        for block1, block2, attn, upsample in stages:
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = block1(x, temb)
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = block2(x, temb)
            x = attn(x)
            if collect_features:
                feats.append(x)
            x = upsample(x)
        return x, feats

    def final(self, x: Array, r: Array, temb: Optional[Array]) -> Array:
        x = jnp.concatenate([x, r], axis=-1)
        x = self.final_res_block(x, temb)
        return self.final_conv(x)

    # ------------------------------------------------------------- forward

    def __call__(
        self,
        x: Array,
        time: Optional[Array] = None,
        cond: Optional[Array] = None,  # accepted but unused (parity: unet_model.py:333)
        *,
        extract_features: bool = False,
    ):
        temb = self.time_embed(time)
        x, r, hs = self.encode(x, temb)
        x = self.run_mid(x, temb)
        x, feats = self.decode(x, r, hs, temb, collect_features=extract_features)
        out = self.final(x, r, temb)
        if extract_features:
            return out, feats
        return out


def count_params(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
