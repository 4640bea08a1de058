"""DDPM process identity tests (SURVEY §4: q_sample/posterior identities,
dynamic thresholding, loss semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tedm_tpu.models import diffusion as dm
from tedm_tpu.ops.schedules import make_schedule


@pytest.fixture(scope="module")
def sched():
    return make_schedule(100, "cosine")


def test_q_sample_interpolates(sched):
    x0 = jnp.ones((2, 4, 4, 1))
    noise = jnp.zeros_like(x0)
    t = jnp.array([0, 99])
    xt = dm.q_sample(sched, x0, t, noise)
    a = np.asarray(sched.sqrt_alphas_cumprod)
    np.testing.assert_allclose(np.asarray(xt)[0], a[0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(xt)[1], a[99], rtol=1e-5)


def test_predict_x0_roundtrip(sched):
    """predict_x0_from_noise inverts q_sample exactly."""
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(rng, (3, 8, 8, 1)) * 2 - 1
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([5, 50, 95])
    xt = dm.q_sample(sched, x0, t, noise)
    x0_rec = dm.predict_x0_from_noise(sched, xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=2e-4)


def test_predict_noise_roundtrip(sched):
    rng = jax.random.PRNGKey(2)
    x0 = jax.random.uniform(rng, (3, 8, 8, 1)) * 2 - 1
    noise = jax.random.normal(jax.random.PRNGKey(3), x0.shape)
    t = jnp.array([5, 50, 95])
    xt = dm.q_sample(sched, x0, t, noise)
    noise_rec = dm.predict_noise_from_x0(sched, xt, t, x0)
    np.testing.assert_allclose(np.asarray(noise_rec), np.asarray(noise), atol=2e-3)


def test_posterior_at_t0_returns_x0(sched):
    """posterior_mean_coef1[0] = 1, coef2[0] = 0: at t=0 the posterior mean is x_0."""
    x0 = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 4, 1))
    xt = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 4, 1))
    mean, _ = dm.q_posterior(sched, x0, xt, jnp.array([0, 0]))
    np.testing.assert_allclose(np.asarray(mean), np.asarray(x0), atol=1e-5)


def test_dynamic_threshold():
    # constant small image: s = max(quantile, 1) = 1 -> unchanged
    x = jnp.full((1, 4, 4, 1), 0.5)
    np.testing.assert_allclose(np.asarray(dm.dynamic_threshold(x, 0.995)), 0.5)
    # large values get clipped to quantile and divided by it -> within [-1, 1]
    x = jnp.concatenate([jnp.full((1, 4, 4, 1), 3.0), jnp.full((1, 4, 4, 1), 0.1)], axis=1)
    out = np.asarray(dm.dynamic_threshold(x, 0.995))
    assert out.max() <= 1.0 and out.min() >= -1.0


def test_dynamic_threshold_matches_torch_quantile():
    """jnp.quantile (linear interpolation) must match torch.quantile used by
    the reference (models/diffusion_model.py:227-229)."""
    rng = np.random.RandomState(0)
    x = rng.randn(2, 100).astype(np.float32)
    jq = np.asarray(jnp.quantile(jnp.abs(jnp.asarray(x)), 0.995, axis=1))
    nq = np.quantile(np.abs(x), 0.995, axis=1)  # numpy 'linear' == torch default
    np.testing.assert_allclose(jq, nq, rtol=1e-5)


def test_topk_quantile_matches_full_quantile():
    """The top_k order-statistic fast path must be exactly the linear-
    interpolated quantile (what the sort-based jnp.quantile computes)."""
    rng = np.random.RandomState(1)
    for n in (100, 128 * 128, 257):
        x = jnp.abs(jnp.asarray(rng.randn(3, n).astype(np.float32)))
        for q in (0.995, 0.9, 0.5):
            fast = np.asarray(dm._quantile_via_topk(x, q))
            ref = np.asarray(jnp.quantile(x, q, axis=1))
            np.testing.assert_allclose(fast, ref, rtol=1e-6, atol=1e-7)
    # threshold output itself identical on a full-size image
    img = jnp.asarray(rng.randn(2, 128, 128, 1).astype(np.float32)) * 2.0
    out = np.asarray(dm.dynamic_threshold(img, 0.995))
    flat = np.abs(np.asarray(img).reshape(2, -1))
    s = np.maximum(np.quantile(flat, 0.995, axis=1), 1.0).reshape(2, 1, 1, 1)
    np.testing.assert_allclose(out, np.clip(np.asarray(img), -s, s) / s, rtol=1e-5)


def _toy_apply(x, t):
    """A fake epsilon-model: predicts zeros."""
    return jnp.zeros_like(x)


def test_train_loss_basic(sched):
    x0 = jax.random.uniform(jax.random.PRNGKey(6), (4, 8, 8, 1))
    loss = dm.train_loss(_toy_apply, sched, jax.random.PRNGKey(7), x0)
    # predicting 0 for unit-normal noise: L1 mean ≈ E|N(0,1)| ≈ 0.798
    assert 0.6 < float(loss) < 1.0


def test_train_loss_perfect_model_is_zero(sched):
    x0 = jax.random.uniform(jax.random.PRNGKey(8), (2, 8, 8, 1))

    # Cheat model: recompute the same noise the loss will use? Not accessible;
    # instead check pred_x_0 objective with identity target.
    def apply_fn(xt, t):
        return dm.normalize_to_neg_one_to_one(
            jnp.tile(x0, (xt.shape[0] // x0.shape[0], 1, 1, 1))
        )

    loss = dm.train_loss(
        apply_fn, sched, jax.random.PRNGKey(9), x0, objective="pred_x_0"
    )
    assert float(loss) == pytest.approx(0.0, abs=1e-6)


def test_val_loss_matches_direct_computation(sched):
    """val_loss (batched-fold scan) equals the naive per-timestep average."""
    x0 = jax.random.uniform(jax.random.PRNGKey(10), (2, 8, 8, 1))

    def apply_fn(xt, t):
        return jnp.zeros_like(xt)

    v = dm.val_loss(apply_fn, sched, jax.random.PRNGKey(11), x0, t_steps=10, fold_batch=4)
    assert np.isfinite(float(v))
    # statistically, also ≈ E|N(0,1)|
    assert 0.6 < float(v) < 1.0


def test_sample_step_t0_is_deterministic(sched):
    x = jax.random.normal(jax.random.PRNGKey(12), (2, 4, 4, 1))
    t = jnp.zeros((2,), jnp.int32)
    s1 = dm.sample_step(_toy_apply, sched, jax.random.PRNGKey(1), x, t)
    s2 = dm.sample_step(_toy_apply, sched, jax.random.PRNGKey(2), x, t)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-7)


def test_sample_loop_shapes_and_range(sched):
    x0 = dm.sample_loop(_toy_apply, sched, jax.random.PRNGKey(13), (2, 8, 8, 1))
    assert x0.shape == (2, 8, 8, 1)
    assert np.all(np.isfinite(np.asarray(x0)))


def test_sample_loop_with_snapshots(sched):
    x0, snaps = dm.sample_loop_with_snapshots(
        _toy_apply, sched, jax.random.PRNGKey(14), (2, 8, 8, 1), n_snapshots=4
    )
    assert snaps.shape == (4, 2, 8, 8, 1)
    # slot 0 holds the final (t=0) frame
    np.testing.assert_allclose(np.asarray(snaps[0]), np.asarray(x0), atol=1e-6)
