"""Segmentation metrics: per-image Dice / precision / recall.

Semantics match the reference exactly (trainers/train_baseline.py:146-161):
boolean masks reduced per image and channel, float division so empty
denominators produce NaN, and aggregation via nanmean
(trainers/train_baseline.py:140-142).

Layout note: this framework is NHWC end-to-end (TPU-native); masks are
(B, H, W, C) with C=1 for lungs.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def _sum_hw(x: Array) -> Array:
    """(B, H, W, C) -> (B, C) spatial sum in fp32."""
    return jnp.sum(x.astype(jnp.float32), axis=(1, 2))


def dice(pred: Array, target: Array) -> Array:
    """2|A∩B| / (|A|+|B|) per image/channel; NaN if both empty."""
    p = pred.astype(bool)
    t = target.astype(bool)
    inter = _sum_hw(jnp.logical_and(p, t))
    return 2.0 * inter / (_sum_hw(p) + _sum_hw(t))


def precision(pred: Array, target: Array) -> Array:
    p = pred.astype(bool)
    t = target.astype(bool)
    tp = _sum_hw(jnp.logical_and(t, p))
    fp = _sum_hw(jnp.logical_and(jnp.logical_not(t), p))
    return tp / (tp + fp)


def recall(pred: Array, target: Array) -> Array:
    p = pred.astype(bool)
    t = target.astype(bool)
    tp = _sum_hw(jnp.logical_and(t, p))
    fn = _sum_hw(jnp.logical_and(t, jnp.logical_not(p)))
    return tp / (tp + fn)


def bce_with_logits(logits: Array, targets: Array) -> Array:
    """Elementwise binary cross-entropy with logits, numerically stable
    (reference loss: trainers/train_baseline.py:44-45 via
    torch.nn.functional.binary_cross_entropy_with_logits)."""
    # max(x,0) - x*y + log(1 + exp(-|x|))
    return (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def nanmean(x: Array) -> Array:
    return jnp.nanmean(x)
