"""DDPM beta schedules and derived coefficient tables.

Behavioral parity with the reference (models/diffusion_model.py:16-47 for the
schedules, :82-115 for the derived buffers), built as a frozen pytree of
jnp arrays so the whole table rides along inside jit/pjit with no host sync.

The tables are computed **in float64 on the host** and cast to fp32 — the
reference computes them in fp32 where the `1 - a_t/a_{t-1}` cancellation
costs ~3 decimal digits; building once in fp64 is free and strictly more
accurate. Golden values (fp64-true, fp32-stored):
    cosine:  beta[0] ≈ 4.1284e-05, beta[999] = 0.999 (clipped)
    linear:  beta[0] = 1e-4,       beta[999] = 0.02
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from jax import Array


def _linear_betas_f64(
    timesteps: int, start: float = 1e-4, end: float = 0.02
) -> np.ndarray:
    scale = 1000.0 / timesteps
    betas = np.linspace(scale * start, scale * end, timesteps, dtype=np.float64)
    # Degenerate-T guard: the 1000/T scaling pushes beta past 1 for T < 50,
    # which makes alphas negative and every derived sqrt NaN. A no-op at the
    # reference T=1000 (max beta 0.02); clipping mirrors the cosine schedule.
    return np.clip(betas, 0.0, 0.999)


def linear_beta_schedule(timesteps: int, start: float = 1e-4, end: float = 0.02) -> Array:
    """Linearly spaced betas, scaled so any T matches T=1000 integrated noise
    (reference: models/diffusion_model.py:16-29)."""
    return jnp.asarray(_linear_betas_f64(timesteps, start, end), dtype=jnp.float32)


def _cosine_betas_f64(timesteps: int, s: float = 0.008) -> np.ndarray:
    x = np.linspace(0.0, float(timesteps), timesteps + 1, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1.0 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0.0, 0.999)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> Array:
    """Nichol & Dhariwal cosine schedule (reference: models/diffusion_model.py:32-47)."""
    return jnp.asarray(_cosine_betas_f64(timesteps, s), dtype=jnp.float32)


class DiffusionSchedule(NamedTuple):
    """All per-timestep coefficients needed by q_sample / posterior / loss
    (reference buffers: models/diffusion_model.py:82-115). Shapes all (T,)."""

    betas: Array
    alphas_cumprod: Array
    sqrt_alphas_cumprod: Array
    sqrt_one_minus_alphas_cumprod: Array
    sqrt_recip_alphas_cumprod: Array
    sqrt_recipm1_alphas_cumprod: Array
    posterior_variance: Array
    posterior_log_variance_clipped: Array
    posterior_mean_coef1: Array
    posterior_mean_coef2: Array
    p2_loss_weight: Array

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def make_schedule(
    timesteps: int = 1000,
    beta_schedule: str = "cosine",
    p2_loss_weight_gamma: float = 0.0,
    p2_loss_weight_k: float = 1.0,
) -> DiffusionSchedule:
    if beta_schedule == "linear":
        betas = _linear_betas_f64(timesteps)
    elif beta_schedule == "cosine":
        betas = _cosine_betas_f64(timesteps)
    else:
        raise ValueError(f"unknown beta schedule {beta_schedule}")

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    p2_loss_weight = (
        p2_loss_weight_k + alphas_cumprod / (1.0 - alphas_cumprod)
    ) ** (-p2_loss_weight_gamma)

    def f32(x: np.ndarray) -> Array:
        return jnp.asarray(x, dtype=jnp.float32)

    return DiffusionSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(np.log(np.clip(posterior_variance, 1e-20, None))),
        posterior_mean_coef1=f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        p2_loss_weight=f32(p2_loss_weight),
    )


def extract(table: Array, t: Array, ndim: int) -> Array:
    """Gather per-sample coefficients and broadcast against an ndim image batch:
    (T,) gathered at t:(B,) -> (B, 1, ..., 1) (reference: trainers/utils.py:48-59)."""
    out = table[t]
    return out.reshape(out.shape[0], *((1,) * (ndim - 1)))
