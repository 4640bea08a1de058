"""Dice/precision/recall on synthetic masks (reference semantics:
trainers/train_baseline.py:146-161 — per-image, NaN on empty denominators)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tedm_tpu.ops.metrics import bce_with_logits, dice, precision, recall


def _m(*rows):
    """Build a (1, H, W, 1) mask from 0/1 rows."""
    a = np.array(rows, dtype=np.float32)
    return jnp.asarray(a)[None, :, :, None]


def test_perfect_prediction():
    y = _m([1, 1, 0, 0])
    assert float(dice(y, y)[0, 0]) == pytest.approx(1.0)
    assert float(precision(y, y)[0, 0]) == pytest.approx(1.0)
    assert float(recall(y, y)[0, 0]) == pytest.approx(1.0)


def test_half_overlap():
    pred = _m([1, 1, 0, 0])
    targ = _m([1, 0, 1, 0])
    # |inter|=1, |pred|=2, |targ|=2 -> dice = 2/4
    assert float(dice(pred, targ)[0, 0]) == pytest.approx(0.5)
    assert float(precision(pred, targ)[0, 0]) == pytest.approx(0.5)
    assert float(recall(pred, targ)[0, 0]) == pytest.approx(0.5)


def test_empty_both_is_nan():
    z = _m([0, 0, 0, 0])
    assert np.isnan(float(dice(z, z)[0, 0]))
    assert np.isnan(float(precision(z, z)[0, 0]))
    assert np.isnan(float(recall(z, z)[0, 0]))


def test_batch_and_channel_shape():
    pred = jnp.ones((4, 8, 8, 1))
    targ = jnp.ones((4, 8, 8, 1))
    assert dice(pred, targ).shape == (4, 1)


def test_bce_matches_definition():
    logits = jnp.array([-3.0, -0.5, 0.0, 0.5, 3.0])
    targets = jnp.array([0.0, 1.0, 0.5, 0.0, 1.0])
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    expected = -(np.asarray(targets) * np.log(p) + (1 - np.asarray(targets)) * np.log(1 - p))
    np.testing.assert_allclose(
        np.asarray(bce_with_logits(logits, targets)), expected, rtol=1e-4, atol=1e-6
    )
