"""The DDPM process as pure functions over a UNet apply-fn.

Behavioral parity with the reference DiffusionModel
(models/diffusion_model.py:50-301): 1000 steps, cosine schedule by default,
epsilon-prediction with **L1** loss (:138), p2 reweighting (:142), ancestral
sampling with clipped posterior log-variance and Imagen-style dynamic
thresholding at the 0.995 quantile (:221-235).

TPU-first design:
* Everything is a pure function of (params, schedule, rng, batch) —
  jit/pjit-able, shard-able, scan-able.
* ``sample_loop`` runs the entire 1000-step reverse trajectory as ONE
  ``lax.scan`` on device (the reference's Python loop of 1000 kernel
  launches, trainers/utils.py:85-88, is the main thing this build deletes).
  Dynamic thresholding's per-batch quantile happens inside the scan body —
  no host sync anywhere.
* ``val_loss`` evaluates evenly-spaced timesteps by folding them into the
  batch axis (one big UNet call) instead of the reference's Python loop over
  ``t`` (models/diffusion_model.py:145-156) — same numbers, MXU-saturating.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from tedm_tpu.ops.schedules import DiffusionSchedule, extract

# An apply function: (x_t, t) -> model output (epsilon or x_0 prediction).
ApplyFn = Callable[[Array, Array], Array]


def normalize_to_neg_one_to_one(x: Array) -> Array:
    return x * 2.0 - 1.0


def unnormalize_to_zero_to_one(x: Array) -> Array:
    return (x + 1.0) * 0.5


def q_sample(
    sched: DiffusionSchedule, x_0: Array, t: Array, noise: Array
) -> Array:
    """Forward diffusion: x_t = sqrt(a_bar_t) x_0 + sqrt(1-a_bar_t) eps
    (reference: models/diffusion_model.py:176-203)."""
    a = extract(sched.sqrt_alphas_cumprod, t, x_0.ndim)
    b = extract(sched.sqrt_one_minus_alphas_cumprod, t, x_0.ndim)
    return a * x_0 + b * noise


def predict_x0_from_noise(sched: DiffusionSchedule, x_t: Array, t: Array, noise: Array) -> Array:
    """(reference: models/diffusion_model.py:269-286)"""
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
        - extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise
    )


def predict_noise_from_x0(sched: DiffusionSchedule, x_t: Array, t: Array, x_0: Array) -> Array:
    """(reference: models/diffusion_model.py:288-301)"""
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - x_0
    ) / extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)


def q_posterior(
    sched: DiffusionSchedule, x_0: Array, x_t: Array, t: Array
) -> Tuple[Array, Array]:
    """Posterior q(x_{t-1} | x_t, x_0) mean and clipped log-variance
    (reference: models/diffusion_model.py:259-267)."""
    mean = (
        extract(sched.posterior_mean_coef1, t, x_t.ndim) * x_0
        + extract(sched.posterior_mean_coef2, t, x_t.ndim) * x_t
    )
    log_var = extract(sched.posterior_log_variance_clipped, t, x_t.ndim)
    return mean, log_var


def _quantile_via_topk(flat: Array, percentile: float) -> Array:
    """Exact linear-interpolated `percentile` quantile of each row of
    ``flat`` (B, n) computed from top-k order statistics. For the high
    percentiles dynamic thresholding uses (0.995 ⇒ top 83 of 16384 pixels),
    ``lax.top_k`` replaces the full O(n log² n) per-step sort the quantile
    would otherwise lower to — same value, measurably cheaper inside the
    1000-step sampling scan."""
    n = flat.shape[1]
    pos = percentile * (n - 1)  # static python float
    i_lo = int(pos)
    frac = pos - i_lo
    k = n - i_lo  # elements from the top covering order stats i_lo, i_lo+1
    top = jax.lax.top_k(flat, k)[0]  # (B, k), descending
    v_lo = top[:, k - 1]  # ascending order stat i_lo
    if frac == 0.0:
        return v_lo
    v_hi = top[:, k - 2] if k >= 2 else v_lo
    return v_lo * (1.0 - frac) + v_hi * frac


def dynamic_threshold(x_0: Array, percentile: float) -> Array:
    """Imagen dynamic thresholding (reference: models/diffusion_model.py:224-231):
    clip to the per-sample `percentile` quantile of |x_0| (floored at 1) and
    rescale into [-1, 1]."""
    flat = jnp.abs(x_0.reshape(x_0.shape[0], -1)).astype(jnp.float32)
    if percentile * (flat.shape[1] - 1) >= flat.shape[1] / 2:
        s = _quantile_via_topk(flat, percentile)
    else:
        s = jnp.quantile(flat, percentile, axis=1)
    s = jnp.maximum(s, 1.0).astype(x_0.dtype)
    s = s.reshape(-1, *((1,) * (x_0.ndim - 1)))
    return jnp.clip(x_0, -s, s) / s


def model_predictions(
    apply_fn: ApplyFn,
    sched: DiffusionSchedule,
    x_t: Array,
    t: Array,
    objective: str = "pred_noise",
) -> Tuple[Array, Array]:
    """Return (pred_noise, pred_x_0) (reference: models/diffusion_model.py:237-257).
    The reference's 'pred_x_start'/'pred_x_0' naming mismatch is fixed: the
    objective is consistently 'pred_x_0'."""
    out = apply_fn(x_t, t)
    if objective == "pred_noise":
        return out, predict_x0_from_noise(sched, x_t, t, out)
    elif objective == "pred_x_0":
        return predict_noise_from_x0(sched, x_t, t, out), out
    raise ValueError(f"unknown objective {objective}")


def p_mean_variance(
    apply_fn: ApplyFn,
    sched: DiffusionSchedule,
    x_t: Array,
    t: Array,
    objective: str = "pred_noise",
    clip_denoised: bool = True,
    dynamic_threshold_percentile: float = 0.995,
) -> Tuple[Array, Array, Array]:
    """(reference: models/diffusion_model.py:221-235)"""
    _, pred_x_0 = model_predictions(apply_fn, sched, x_t, t, objective)
    if clip_denoised:
        pred_x_0 = dynamic_threshold(pred_x_0, dynamic_threshold_percentile)
    mean, log_var = q_posterior(sched, pred_x_0, x_t, t)
    return mean, log_var, pred_x_0


def sample_step(
    apply_fn: ApplyFn,
    sched: DiffusionSchedule,
    rng: Array,
    x_t: Array,
    t: Array,
    objective: str = "pred_noise",
    dynamic_threshold_percentile: float = 0.995,
) -> Array:
    """One ancestral reverse step x_t -> x_{t-1}
    (reference: models/diffusion_model.py:205-219). `t` is a (B,) int array;
    noise is suppressed at t == 0 via a mask (scan-friendly, no Python branch).
    """
    mean, log_var, _ = p_mean_variance(
        apply_fn, sched, x_t, t, objective, True, dynamic_threshold_percentile
    )
    noise = jax.random.normal(rng, x_t.shape, dtype=x_t.dtype)
    nonzero = (t > 0).astype(x_t.dtype).reshape(-1, *((1,) * (x_t.ndim - 1)))
    return mean + jnp.exp(0.5 * log_var) * noise * nonzero


def sample_loop(
    apply_fn: ApplyFn,
    sched: DiffusionSchedule,
    rng: Array,
    shape: Tuple[int, ...],
    objective: str = "pred_noise",
    dynamic_threshold_percentile: float = 0.995,
    dtype=jnp.float32,
) -> Array:
    """Full T-step reverse trajectory as a single on-device ``lax.scan``.
    Returns the final sample in [-1, 1]. (The reference runs 1000 sequential
    Python-level ``sample_timestep`` calls, trainers/utils.py:85-88.)"""
    T = sched.num_timesteps
    rng, init_rng = jax.random.split(rng)
    x_T = jax.random.normal(init_rng, shape, dtype=dtype)
    step_rngs = jax.random.split(rng, T)

    def body(x, inputs):
        t_scalar, step_rng = inputs
        t = jnp.full((shape[0],), t_scalar, dtype=jnp.int32)
        x = sample_step(
            apply_fn, sched, step_rng, x, t, objective, dynamic_threshold_percentile
        )
        return x, None

    ts = jnp.arange(T - 1, -1, -1)
    x_0, _ = jax.lax.scan(body, x_T, (ts, step_rngs))
    return x_0


def sample_loop_with_snapshots(
    apply_fn: ApplyFn,
    sched: DiffusionSchedule,
    rng: Array,
    shape: Tuple[int, ...],
    n_snapshots: int = 8,
    objective: str = "pred_noise",
    dynamic_threshold_percentile: float = 0.995,
    dtype=jnp.float32,
) -> Tuple[Array, Array]:
    """Memory-bounded variant: keeps only ``n_snapshots`` frames by writing
    into a fixed (n_snapshots, *shape) buffer inside the scan."""
    T = sched.num_timesteps
    stepsize = T // n_snapshots
    rng, init_rng = jax.random.split(rng)
    x_T = jax.random.normal(init_rng, shape, dtype=dtype)
    step_rngs = jax.random.split(rng, T)
    snaps = jnp.zeros((n_snapshots, *shape), dtype=dtype)

    def body(carry, inputs):
        x, snaps = carry
        t_scalar, step_rng = inputs
        t = jnp.full((shape[0],), t_scalar, dtype=jnp.int32)
        x = sample_step(
            apply_fn, sched, step_rng, x, t, objective, dynamic_threshold_percentile
        )
        # Reference keeps frames at t % stepsize == 0 (trainers/utils.py:88).
        slot = jnp.clip(t_scalar // stepsize, 0, n_snapshots - 1)
        write = (t_scalar % stepsize) == 0
        new = jnp.where(write, x, snaps[slot])
        snaps = jax.lax.dynamic_update_index_in_dim(snaps, new, slot, 0)
        return (x, snaps), None

    ts = jnp.arange(T - 1, -1, -1)
    (x_0, snaps), _ = jax.lax.scan(body, (x_T, snaps), (ts, step_rngs))
    return x_0, snaps


def ddim_sample_loop(
    apply_fn: ApplyFn,
    sched: DiffusionSchedule,
    rng: Array,
    shape: Tuple[int, ...],
    num_steps: int = 50,
    eta: float = 0.0,
    objective: str = "pred_noise",
    dynamic_threshold_percentile: float = 0.995,
    dtype=jnp.float32,
) -> Array:
    """DDIM sampling (Song et al. 2021) over ``num_steps`` of the T-step
    schedule — a fast-sampling capability the reference lacks (it always
    runs the full 1000 sequential steps, trainers/utils.py:85-88). One
    jitted ``lax.scan``; eta=0 is deterministic given x_T."""
    T = sched.num_timesteps
    # evenly spaced subsequence, descending, ending at 0
    ts = jnp.linspace(0.0, T - 1, num_steps).round().astype(jnp.int32)[::-1]
    ts_prev = jnp.concatenate([ts[1:], jnp.array([-1], jnp.int32)])
    rng, init_rng = jax.random.split(rng)
    x_T = jax.random.normal(init_rng, shape, dtype=dtype)
    step_rngs = jax.random.split(rng, num_steps)
    a_bar = sched.alphas_cumprod

    def body(x, inputs):
        t, t_prev, r = inputs
        tb = jnp.full((shape[0],), t, jnp.int32)
        pred_noise, x_0 = model_predictions(apply_fn, sched, x, tb, objective)
        x_0 = dynamic_threshold(x_0, dynamic_threshold_percentile)
        # recompute noise consistent with the thresholded x_0
        pred_noise = predict_noise_from_x0(sched, x, tb, x_0)
        a_t = a_bar[t]
        a_prev = jnp.where(t_prev >= 0, a_bar[jnp.maximum(t_prev, 0)], 1.0)
        sigma = (
            eta
            * jnp.sqrt((1 - a_prev) / (1 - a_t))
            * jnp.sqrt(1 - a_t / a_prev)
        )
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * pred_noise
        noise = jax.random.normal(r, shape, dtype=dtype)
        x = jnp.sqrt(a_prev) * x_0 + dir_xt + sigma * noise * (t_prev >= 0)
        return x.astype(dtype), None

    x_0, _ = jax.lax.scan(body, x_T, (ts, ts_prev, step_rngs))
    return x_0


def dpmpp2m_sample_loop(
    apply_fn: ApplyFn,
    sched: DiffusionSchedule,
    rng: Array,
    shape: Tuple[int, ...],
    num_steps: int = 20,
    objective: str = "pred_noise",
    dynamic_threshold_percentile: float = 0.995,
    dtype=jnp.float32,
) -> Array:
    """DPM-Solver++(2M) (Lu et al. 2022): deterministic second-order
    multistep sampling in log-SNR time with the data-prediction
    parameterization — higher quality than DDIM at very low step counts
    (10-25). A fast-sampling capability beyond the reference (which always
    runs 1000 ancestral steps). One jitted ``lax.scan``.

    Update (data prediction), with lambda = log(alpha/sigma),
    h_i = lambda_i - lambda_{i-1}, r = h_{i-1}/h_i:
        D = (1 + 1/(2r)) x0_i - 1/(2r) x0_{i-1}       (first step: D = x0)
        x <- (sigma_i/sigma_{i-1}) x - alpha_i (exp(-h_i) - 1) D
    """
    T = sched.num_timesteps
    ts = jnp.linspace(0.0, T - 1, num_steps + 1).round().astype(jnp.int32)[::-1]
    a_bar = sched.alphas_cumprod
    alpha = jnp.sqrt(a_bar)
    sigma = jnp.sqrt(1.0 - a_bar)
    lam = jnp.log(alpha) - jnp.log(sigma)

    rng, init_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, shape, dtype=dtype)

    def x0_of(x, t_scalar):
        tb = jnp.full((shape[0],), t_scalar, jnp.int32)
        _, x0 = model_predictions(apply_fn, sched, x, tb, objective)
        return dynamic_threshold(x0, dynamic_threshold_percentile)

    def body(carry, inputs):
        x, x0_prev, lam_prev_prev, first = carry
        t_from, t_to = inputs
        x0 = x0_of(x, t_from)
        l_from, l_to = lam[t_from], lam[t_to]
        h = l_to - l_from
        # previous step size in lambda-time (h_prev = l_from - l_prev_prev);
        # r guarded on the first step where h_prev = 0 (D_2m is discarded
        # there, but inf/nan must not be materialized)
        h_prev = l_from - lam_prev_prev
        r = jnp.where(first, 1.0, h_prev / h)
        D_2m = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * x0_prev
        D = jnp.where(first, x0, D_2m)
        # final transition targets the clean state (lambda -> inf:
        # sigma_to = 0, alpha_to = 1, exp(-h) = 0) — same convention as
        # DDIM's t_prev = -1, removing the sigma_0 noise floor
        last = t_to == 0
        sig_to = jnp.where(last, 0.0, sigma[t_to])
        alp_to = jnp.where(last, 1.0, alpha[t_to])
        emh = jnp.where(last, 0.0, jnp.exp(-h))
        x = (sig_to / sigma[t_from]) * x - alp_to * (emh - 1.0) * D
        return (x.astype(dtype), x0, l_from, jnp.bool_(False)), None

    pairs = (ts[:-1], ts[1:])
    (x, x0_last, _, _), _ = jax.lax.scan(
        body, (x, jnp.zeros(shape, dtype), lam[ts[0]], jnp.bool_(True)), pairs
    )
    # final step lands at t=0 where alpha ~= 1; x is the sample in [-1, 1]
    return x


def train_loss(
    apply_fn: ApplyFn,
    sched: DiffusionSchedule,
    rng: Array,
    x_0: Array,
    objective: str = "pred_noise",
    normalize: bool = True,
    t: Optional[Array] = None,
    valid: Optional[Array] = None,
    aux_channel_losses: bool = False,
) -> Array:
    """L1 epsilon-matching loss with p2 reweighting
    (reference: models/diffusion_model.py:120-143). x_0 is in [0, 1] when
    ``normalize``; t defaults to per-sample uniform. ``valid`` (B,) masks
    out padding rows from the mean (static-shape input pipeline).

    ``aux_channel_losses`` additionally returns the per-channel (C,) loss
    split — the reference's intended img/seg loss logging for joint
    training (train_base_diffusion.py:38-43,58-62, dead there because it is
    gated on the never-defined ``config.joint_training``)."""
    n = x_0.shape[0]
    t_rng, noise_rng = jax.random.split(rng)
    if t is None:
        t = jax.random.randint(t_rng, (n,), 0, sched.num_timesteps)
    if normalize:
        x_0 = normalize_to_neg_one_to_one(x_0)
    noise = jax.random.normal(noise_rng, x_0.shape, dtype=x_0.dtype)
    x_t = q_sample(sched, x_0, t, noise)
    out = apply_fn(x_t, t)
    target = noise if objective == "pred_noise" else x_0
    err = jnp.abs(out.astype(jnp.float32) - target.astype(jnp.float32))
    p2 = sched.p2_loss_weight[t]
    row_w = jnp.ones((n,), jnp.float32) if valid is None else valid.astype(jnp.float32)
    denom = jnp.maximum(row_w.sum(), 1.0)
    loss = err.reshape(n, -1).mean(axis=1) * p2
    total = (loss * row_w).sum() / denom
    if not aux_channel_losses:
        return total
    per_ch = err.reshape(n, -1, x_0.shape[-1]).mean(axis=1) * p2[:, None]
    per_ch = (per_ch * row_w[:, None]).sum(axis=0) / denom
    return total, per_ch


def val_loss(
    apply_fn: ApplyFn,
    sched: DiffusionSchedule,
    rng: Array,
    x_0: Array,
    t_steps: int,
    objective: str = "pred_noise",
    normalize: bool = True,
    fold_batch: int = 8,
    valid: Optional[Array] = None,
) -> Array:
    """Mean loss over evenly-spaced timesteps
    (reference: models/diffusion_model.py:145-156). The reference loops over
    timesteps in Python; here the timesteps are folded into the batch axis in
    chunks of ``fold_batch`` and scanned — identical estimator, far fewer,
    far larger device calls. ``valid`` (B,) masks padded batch rows so eval
    keeps static shapes (no per-tail recompiles)."""
    T = sched.num_timesteps
    step = max(T // t_steps, 1)  # t_steps > T (tiny debug configs) → every step
    t_values = jnp.arange(0, T, step)  # (S,)
    S = t_values.shape[0]
    n = x_0.shape[0]
    pad = (-S) % fold_batch
    t_padded = jnp.pad(t_values, (0, pad))
    t_valid = jnp.pad(jnp.ones((S,), jnp.float32), (0, pad))
    t_chunks = t_padded.reshape(-1, fold_batch)
    v_chunks = t_valid.reshape(-1, fold_batch)
    rngs = jax.random.split(rng, t_chunks.shape[0])
    row_w = jnp.ones((n,), jnp.float32) if valid is None else valid.astype(jnp.float32)
    row_denom = jnp.maximum(row_w.sum(), 1.0)

    if normalize:
        x_0n = normalize_to_neg_one_to_one(x_0)
    else:
        x_0n = x_0

    def chunk_loss(carry, inputs):
        t_chunk, v_chunk, crng = inputs
        # (F*n,) timesteps: each of the F chunk values applied to the full batch
        t_rep = jnp.repeat(t_chunk, n)
        x_rep = jnp.tile(x_0n, (fold_batch, *([1] * (x_0.ndim - 1))))
        noise = jax.random.normal(crng, x_rep.shape, dtype=x_rep.dtype)
        x_t = q_sample(sched, x_rep, t_rep, noise)
        out = apply_fn(x_t, t_rep)
        tgt = noise if objective == "pred_noise" else x_rep
        l = jnp.abs(out.astype(jnp.float32) - tgt.astype(jnp.float32))
        l = l.reshape(fold_batch * n, -1).mean(axis=1)
        l = l * sched.p2_loss_weight[t_rep]
        # masked mean over batch per t (padding rows excluded)
        per_t = (l.reshape(fold_batch, n) * row_w).sum(axis=1) / row_denom
        return carry + jnp.sum(per_t * v_chunk), None

    total, _ = jax.lax.scan(chunk_loss, jnp.float32(0.0), (t_chunks, v_chunks, rngs))
    return total / S
