"""Contrastive pretraining models + losses (Chaitanya et al. baselines).

Reference: models/global_local_cl.py and the loss functions in
trainers/train_global_cl.py:36-44 / trainers/train_local_cl.py:36-77.

``GlobalCL``/``LocalCL`` reuse the SAME ``Unet`` module as a named
submodule ("unet") so params flow between pretraining and finetuning by
subtree assignment — the functional analogue of the reference's
``load_state_dict(strict=False)`` onto a Unet subclass
(finetune_glob_cl.py:139-141).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from tedm_tpu.models.unet import Conv, Dense, Unet

Dtype = Any


class GlobalCL(nn.Module):
    """UNet encoder + mid + global MLP head g1:
    Flatten -> Dense(1024, no bias) -> ReLU -> Dense(128, no bias)
    (reference: models/global_local_cl.py:8-50)."""

    img_size: int = 128
    dim: int = 64
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 1
    g_emb: int = 1024
    g_out: int = 128
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    use_pallas_groupnorm: bool = False
    use_pallas_resblock: bool = False
    use_pallas_flash: bool = False
    attn_layout: str = "heads_major"

    def setup(self) -> None:
        self.unet = Unet(
            dim=self.dim, dim_mults=tuple(self.dim_mults), channels=self.channels,
            dtype=self.dtype, use_pallas=self.use_pallas,
            use_pallas_groupnorm=self.use_pallas_groupnorm,
            use_pallas_resblock=self.use_pallas_resblock,
            use_pallas_flash=self.use_pallas_flash,
            attn_layout=self.attn_layout, name="unet",
        )
        # Torch-matched kernel init (reference heads are plain nn.Linear,
        # models/global_local_cl.py:29-47) — see unet._torch_kernel_init.
        self.g1_fc1 = Dense(self.g_emb, use_bias=False, dtype=self.dtype, name="g1_fc1")
        self.g1_fc2 = Dense(self.g_out, use_bias=False, dtype=self.dtype, name="g1_fc2")

    def __call__(self, x: Array) -> Array:
        x, _, _ = self.unet.encode(x, None)
        x = self.unet.run_mid(x, None)
        x = x.reshape(x.shape[0], -1)
        x = self.g1_fc1(x)
        x = nn.relu(x)
        return self.g1_fc2(x)


class LocalCL(nn.Module):
    """UNet encoder + mid + first ``l`` decoder stages + local head g2:
    Conv1x1(no bias) -> ReLU -> BN -> Conv1x1(no bias)
    (reference: models/global_local_cl.py:53-107)."""

    img_size: int = 128
    dim: int = 64
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 1
    l: int = 2
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    use_pallas_groupnorm: bool = False
    use_pallas_resblock: bool = False
    use_pallas_flash: bool = False
    attn_layout: str = "heads_major"

    def setup(self) -> None:
        self.unet = Unet(
            dim=self.dim, dim_mults=tuple(self.dim_mults), channels=self.channels,
            dtype=self.dtype, use_pallas=self.use_pallas,
            use_pallas_groupnorm=self.use_pallas_groupnorm,
            use_pallas_resblock=self.use_pallas_resblock,
            use_pallas_flash=self.use_pallas_flash,
            attn_layout=self.attn_layout, name="unet",
        )
        dims = [self.dim] + [self.dim * m for m in self.dim_mults]
        mid_dim = dims[-self.l - 1]
        # Torch-matched kernel init (reference: nn.Conv2d defaults,
        # models/global_local_cl.py:62-66) — see unet._torch_kernel_init.
        self.g2_conv1 = Conv(mid_dim, (1, 1), use_bias=False, dtype=self.dtype, name="g2_conv1")
        self.g2_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=jnp.float32, name="g2_bn")
        self.g2_conv2 = Conv(mid_dim, (1, 1), use_bias=False, dtype=self.dtype, name="g2_conv2")

    def __call__(self, x: Array, train: bool = False) -> Array:
        x, r, hs = self.unet.encode(x, None)
        x = self.unet.run_mid(x, None)
        x, _ = self.unet.decode(x, r, hs, None, n_stages=self.l)
        x = self.g2_conv1(x)
        x = nn.relu(x)
        x = self.g2_bn(x, use_running_average=not train)
        return self.g2_conv2(x)


def global_nt_xent(features: Array, batch_size: int, tau: float) -> Array:
    """SimCLR NT-Xent exactly as the reference computes it
    (trainers/train_global_cl.py:36-44): features (2B, D), first B = view 1."""
    f = features.astype(jnp.float32)
    f = f / jnp.linalg.norm(f, axis=1, keepdims=True)
    sim = jnp.exp(f @ f.T / tau)
    b = batch_size
    pos1 = jnp.diagonal(sim[:b, b:])
    neg1 = sim[:b].sum(-1) - jnp.diagonal(sim[:b, :b])
    pos2 = jnp.diagonal(sim[b:, :b])
    neg2 = sim[b:].sum(-1) - jnp.diagonal(sim[b:, b:])
    return (-jnp.log(pos1 / neg1).mean() - jnp.log(pos2 / neg2).mean()) / 2


def _local_masks(batch_size: int, n_regions: int, diag_offset: int):
    """Static pos/neg diagonal masks (reference:
    trainers/train_local_cl.py:37-57), built host-side in numpy."""
    n = batch_size * n_regions * 2
    half = batch_size * n_regions

    def diag_ones(k):
        m = np.zeros((n, n), np.float32)
        idx = np.arange(n - abs(k))
        if k >= 0:
            m[idx, idx + k] = 1.0
        else:
            m[idx - k, idx] = 1.0
        return m

    pos = diag_ones(-half + diag_offset) + diag_ones(half + diag_offset)
    pos[:half, :half] = 0
    pos[half:, half:] = 0
    neg = np.zeros((n, n), np.float32)
    for region in range(-2 * n_regions + 1, 2 * n_regions):
        neg += diag_ones(region * batch_size + diag_offset)
    neg[:half, :half] = 0
    neg[half:, half:] = 0
    rows = pos.sum(1) > 0
    return pos, neg, rows


def local_region_loss(
    rng: Array, features: Array, batch_size: int, tau: float, n_regions: int = 20
) -> Array:
    """Region-contrastive InfoNCE over ``n_regions`` random 3x3 patches
    (reference: trainers/train_local_cl.py:60-77). ``features`` is NHWC
    (2B, H, W, C); the same region centers are used for every image, and the
    masked-exp quirk of the reference (masked-out logits contribute
    exp(0)=1 to the negative sum) is preserved for parity."""
    f = features.astype(jnp.float32)
    n2, hh, ww, cc = f.shape
    kx, ky = jax.random.split(rng)
    cx = jax.random.permutation(kx, hh - 2)[:n_regions] + 1
    cy = jax.random.permutation(ky, ww - 2)[:n_regions] + 1

    def take_region(i):
        return jax.lax.dynamic_slice(
            f, (0, cx[i] - 1, cy[i] - 1, 0), (n2, 3, 3, cc)
        )

    regions = jnp.stack([take_region(i) for i in range(n_regions)], axis=1)
    # '(aug b) r h w c -> (aug r b) (h w c)'
    regions = regions.reshape(2, batch_size, n_regions, -1)
    regions = regions.transpose(0, 2, 1, 3).reshape(2 * n_regions * batch_size, -1)
    regions = regions / jnp.linalg.norm(regions, axis=1, keepdims=True)
    logits = regions @ regions.T / tau

    loss = jnp.float32(0.0)
    for diag_offset in range(-batch_size + 1, batch_size):
        pos, neg, rows = _local_masks(batch_size, n_regions, diag_offset)
        pos_logits = (logits * pos).sum(1)[rows]
        neg_logits = jnp.log(jnp.exp(logits * neg).sum(1))[rows]
        loss = loss + (-pos_logits + neg_logits).mean()
    return loss
