"""Diffusion-feature segmentation: extraction + pixel classifiers.

Reference semantics (models/datasetDM_model.py, trainers/train_datasetDM.py):
per timestep t in ``t_steps_to_save``, q_sample the input to x_t, run the
frozen UNet once, hook the 4 decoder attention outputs
(512@16², 256@32², 128@64², 64@128²), nearest-resize each to 128², concat
along channels (stage-major within each step, step-major overall) → 960·S
channels; then a 1x1-conv MLP [→128, ReLU, BN, →32, ReLU, BN, →1].
TEDM (shared weights) folds the step axis into batch before a 960-input
classifier (train_datasetDM.py:30-42) and ensembles sigmoids over steps at
test time (app.py:79).

TPU-first re-design (same math, different dataflow):

* **One UNet pass for all S timesteps**: timesteps fold into the batch axis
  (S·B) — MXU-saturating, instead of S sequential passes.
* **Features never leave the device** (the reference detaches to CPU per
  hook call, datasetDM_model.py:27).
* **Fused resize+concat+conv**: a 1x1 conv commutes with nearest resize,
  and a conv over concatenated channels is a sum of convs over the parts.
  So layer 1 is computed per stage at native resolution
  (f_s @ W_s, an MXU matmul), THEN upsampled and summed — the
  (B, S·960, 128, 128) feature tensor (≈503 MB per 16-image batch per step
  in fp32) is never materialized. Numerically identical for nearest resize.
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from tedm_tpu.models.diffusion import normalize_to_neg_one_to_one, q_sample
from tedm_tpu.models.unet import Conv, _torch_kernel_init
from tedm_tpu.ops.resize import nearest_resize
from tedm_tpu.ops.schedules import DiffusionSchedule

Dtype = Any


def extract_features(
    unet_apply: Callable[..., Tuple[Array, List[Array]]],
    sched: DiffusionSchedule,
    x_0: Array,
    t_steps: Sequence[int],
    rng: Optional[Array] = None,
    noise: Optional[Array] = None,
    normalize: bool = True,
) -> List[Array]:
    """Decoder features for every timestep in one batched UNet call.

    Returns a list over the 4 up stages of (S*B, h_s, w_s, c_s) arrays,
    step-major on the folded axis (step s occupies rows [s*B, (s+1)*B)).

    RNG semantics match the reference (models/datasetDM_model.py:67-83):
    ``noise`` given → the SAME noise for every timestep; otherwise fresh
    noise per timestep from ``rng``.
    """
    B = x_0.shape[0]
    S = len(t_steps)
    if normalize:
        x_0 = normalize_to_neg_one_to_one(x_0)
    t = jnp.asarray(t_steps, jnp.int32)            # (S,)
    t_rep = jnp.repeat(t, B)                       # (S*B,) step-major
    x_rep = jnp.tile(x_0, (S, 1, 1, 1))            # (S*B, H, W, C)
    if noise is not None:
        noise_rep = jnp.tile(noise, (S, 1, 1, 1))
    else:
        if rng is None:
            raise ValueError("need rng or noise")
        noise_rep = jax.random.normal(rng, x_rep.shape, x_rep.dtype)
    x_t = q_sample(sched, x_rep, t_rep, noise_rep)
    _, feats = unet_apply(x_t, t_rep, extract_features=True)
    return feats


class PixelClassifier(nn.Module):
    """The datasetDM 1x1-conv MLP head with the fused multi-scale layer 1.

    ``n_steps == 1`` with folded (S*B) input ≡ TEDM shared-weights head
    (127,489 params); ``n_steps == S`` with B-batch input ≡ LEDM/LEDMe head
    (373,249 params for S=3). Parameter count and channel ordering match
    the reference heads exactly (layer-1 kernel rows are ordered
    [step-major × stage-major × channel], reference concat order
    datasetDM_model.py:78-83).
    """

    stage_channels: Sequence[int] = (512, 256, 128, 64)
    n_steps: int = 1
    hidden: Sequence[int] = (128, 32)
    out_channels: int = 1
    img_size: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: List[Array], train: bool = False) -> Array:
        """feats: list over stages of (n_steps*B, h_s, w_s, c_s)."""
        per_step = sum(self.stage_channels)
        c_in = per_step * self.n_steps
        h1 = self.hidden[0]
        # Torch-matched init (kaiming_uniform(a=sqrt(5)) == uniform with
        # variance 1/(3*fan_in), reference torch Conv2d defaults in
        # models/datasetDM_model.py:57-64). The heads are exactly the
        # models trained at n in {1,3}; the UNet measurement (round 2:
        # lecun_normal's 3x variance cost 0.937-vs-0.995 n=1 Dice) applies
        # with the same force here. fan_in of a 1x1 conv = c_in, which is
        # what variance_scaling("fan_in") derives from the (c_in, h1) shape.
        w1 = self.param(
            "conv1_kernel",
            _torch_kernel_init,
            (c_in, h1),
            jnp.float32,
        )
        b1 = self.param("conv1_bias", nn.initializers.zeros, (h1,), jnp.float32)

        n_fold = feats[0].shape[0]
        B = n_fold // self.n_steps
        acc = None
        for s in range(self.n_steps):
            off = s * per_step
            for f, c in zip(feats, self.stage_channels):
                f_s = f.reshape(self.n_steps, B, *f.shape[1:])[s] if self.n_steps > 1 else f
                w_slice = w1[off : off + c].astype(self.dtype)
                y = jnp.einsum(
                    "bhwc,cd->bhwd", f_s.astype(self.dtype), w_slice,
                    preferred_element_type=jnp.float32,
                )
                y = nearest_resize(y, self.img_size, self.img_size)
                acc = y if acc is None else acc + y
                off += c
        x = acc + b1
        x = nn.relu(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="bn1",
        )(x)
        x = Conv(self.hidden[1], (1, 1), dtype=self.dtype, name="conv2")(x)
        x = nn.relu(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="bn2",
        )(x)
        return Conv(self.out_channels, (1, 1), dtype=jnp.float32, name="conv3")(x)


class LinearProbe(nn.Module):
    """ModDatasetDM: one 1x1 conv over all S·960 channels with optional
    feature standardization (reference: trainers/datasetDM_per_step.py:17-32).

    The reference computes normalized features then discards them (:30-31);
    here ``standardize=True`` actually applies (f - mean)/std, with mean/var
    kept in a ``stats`` variable collection filled by ``set_stats``.
    """

    stage_channels: Sequence[int] = (512, 256, 128, 64)
    n_steps: int = 1
    out_channels: int = 1
    img_size: int = 128
    standardize: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: List[Array]) -> Array:
        per_step = sum(self.stage_channels)
        c_in = per_step * self.n_steps
        # Torch-matched init, same rationale as PixelClassifier (reference
        # probe: torch Conv2d default, trainers/datasetDM_per_step.py:26).
        w = self.param(
            "kernel", _torch_kernel_init, (c_in, self.out_channels), jnp.float32
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
        mean = self.variable("stats", "mean", lambda: jnp.zeros((c_in,), jnp.float32))
        std = self.variable("stats", "std", lambda: jnp.ones((c_in,), jnp.float32))

        n_fold = feats[0].shape[0]
        B = n_fold // self.n_steps
        acc = None
        for s in range(self.n_steps):
            off = s * per_step
            for f, c in zip(feats, self.stage_channels):
                f_s = f.reshape(self.n_steps, B, *f.shape[1:])[s] if self.n_steps > 1 else f
                f_s = f_s.astype(jnp.float32)
                w_slice = w[off : off + c]
                if self.standardize:
                    m = mean.value[off : off + c]
                    sd = std.value[off : off + c]
                    f_s = (f_s - m) / sd
                y = jnp.einsum("bhwc,cd->bhwd", f_s, w_slice,
                               preferred_element_type=jnp.float32)
                y = nearest_resize(y, self.img_size, self.img_size)
                acc = y if acc is None else acc + y
                off += c
        return acc + b


def masked_feature_sums(
    feats: List[Array], n_steps: int, valid: Array
) -> Tuple[Array, Array, Array]:
    """Per-channel (sum, sum-of-squares, count) over valid rows and space,
    in the concatenated [step x stage x channel] order — building blocks
    for the probe's standardization pre-pass that exclude the input
    pipeline's zero-padded batch rows (reference pre-pass:
    datasetDM_per_step.py:104-113 has no padding to worry about)."""
    n_fold = feats[0].shape[0]
    B = n_fold // n_steps
    w = valid.reshape(B, 1, 1, 1).astype(jnp.float32)
    sums, sqs, cnts = [], [], []
    for s in range(n_steps):
        for f in feats:
            f_s = f.reshape(n_steps, B, *f.shape[1:])[s] if n_steps > 1 else f
            f_s = f_s.astype(jnp.float32)
            sums.append((f_s * w).sum(axis=(0, 1, 2)))
            sqs.append((jnp.square(f_s) * w).sum(axis=(0, 1, 2)))
            cnt = valid.sum() * f_s.shape[1] * f_s.shape[2]
            cnts.append(jnp.full((f_s.shape[-1],), cnt, jnp.float32))
    return jnp.concatenate(sums), jnp.concatenate(sqs), jnp.concatenate(cnts)


def feature_moments(feats: List[Array], n_steps: int) -> Tuple[Array, Array]:
    """Per-channel mean/std over (batch, space) for the probe's
    standardization pre-pass (reference: datasetDM_per_step.py:104-113),
    in the concatenated [step × stage × channel] order."""
    n_fold = feats[0].shape[0]
    B = n_fold // n_steps
    means, stds = [], []
    for s in range(n_steps):
        for f in feats:
            f_s = f.reshape(n_steps, B, *f.shape[1:])[s] if n_steps > 1 else f
            f_s = f_s.astype(jnp.float32)
            means.append(jnp.mean(f_s, axis=(0, 1, 2)))
            stds.append(jnp.std(f_s, axis=(0, 1, 2)))
    return jnp.concatenate(means), jnp.concatenate(stds)
