"""DDIM fast sampler: shape/finiteness, determinism at eta=0, and
consistency with the ancestral sampler on a closed-form model.

For the analytically-solvable case where the model predicts the true
noise of x_t = sqrt(a_bar) * mu (i.e. data is a delta at mu), both
samplers must converge to mu."""

import jax
import jax.numpy as jnp
import numpy as np

from tedm_tpu.models.diffusion import ddim_sample_loop, sample_loop
from tedm_tpu.ops.schedules import make_schedule


def _delta_model(sched, mu):
    """Optimal eps-prediction when p(x_0) = delta(mu): noise that maps
    x_t back to exactly mu."""

    def apply_fn(x_t, t):
        a = sched.sqrt_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        b = sched.sqrt_one_minus_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        return (x_t - a * mu) / b

    return apply_fn


def test_ddim_deterministic_and_converges():
    sched = make_schedule(100, "cosine")
    mu = jnp.full((1, 8, 8, 1), 0.35)
    apply_fn = _delta_model(sched, mu)
    out1 = ddim_sample_loop(apply_fn, sched, jax.random.PRNGKey(0), (1, 8, 8, 1), 20)
    out2 = ddim_sample_loop(apply_fn, sched, jax.random.PRNGKey(0), (1, 8, 8, 1), 20)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))  # eta=0
    np.testing.assert_allclose(np.asarray(out1), np.asarray(mu), atol=1e-2)


def test_ddim_matches_ancestral_mode():
    sched = make_schedule(100, "cosine")
    mu = jnp.full((2, 8, 8, 1), -0.2)
    apply_fn = _delta_model(sched, mu)
    anc = sample_loop(apply_fn, sched, jax.random.PRNGKey(1), (2, 8, 8, 1))
    ddim = ddim_sample_loop(apply_fn, sched, jax.random.PRNGKey(2), (2, 8, 8, 1), 50)
    np.testing.assert_allclose(np.asarray(anc), np.asarray(mu), atol=5e-2)
    np.testing.assert_allclose(np.asarray(ddim), np.asarray(mu), atol=1e-2)


def test_dpmpp2m_deterministic_and_converges():
    from tedm_tpu.models.diffusion import dpmpp2m_sample_loop

    sched = make_schedule(100, "cosine")
    mu = jnp.full((1, 8, 8, 1), 0.4)
    apply_fn = _delta_model(sched, mu)
    a = dpmpp2m_sample_loop(apply_fn, sched, jax.random.PRNGKey(0), (1, 8, 8, 1), 10)
    b = dpmpp2m_sample_loop(apply_fn, sched, jax.random.PRNGKey(0), (1, 8, 8, 1), 10)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(a)).all()
    np.testing.assert_allclose(np.asarray(a), np.asarray(mu), atol=1e-2)


def test_dpmpp2m_beats_ddim_at_low_steps():
    """On a curved-x0 model (x0 prediction depends on t), the second-order
    multistep should land closer than DDIM for the same tiny step count."""
    from tedm_tpu.models.diffusion import dpmpp2m_sample_loop

    sched = make_schedule(200, "cosine")

    def curved(x_t, t):
        # state-dependent eps-prediction (linear ODE): neither sampler is
        # trivially exact, so integrator order becomes observable
        return 0.5 * x_t

    # ODE-accuracy test: the reference solution is the SAME deterministic
    # probability-flow trajectory at many steps (eta=0 DDIM, shared key);
    # the second-order multistep must land closer at a tiny step count.
    ref = ddim_sample_loop(curved, sched, jax.random.PRNGKey(5), (1, 8, 8, 1), 190)
    dd = ddim_sample_loop(curved, sched, jax.random.PRNGKey(5), (1, 8, 8, 1), 6)
    dp = dpmpp2m_sample_loop(curved, sched, jax.random.PRNGKey(5), (1, 8, 8, 1), 6)
    err_dd = float(jnp.abs(dd - ref).mean())
    err_dp = float(jnp.abs(dp - ref).mean())
    assert err_dp < err_dd, (err_dp, err_dd)


def test_ddim_eta_injects_noise():
    """With a non-degenerate model (predicts zero noise), the same PRNG key
    must give identical eta=0 runs but a different eta=1 run."""
    sched = make_schedule(50, "cosine")
    apply_fn = lambda x_t, t: jnp.zeros_like(x_t)
    a = ddim_sample_loop(apply_fn, sched, jax.random.PRNGKey(3), (1, 4, 4, 1), 10, eta=0.0)
    b = ddim_sample_loop(apply_fn, sched, jax.random.PRNGKey(3), (1, 4, 4, 1), 10, eta=1.0)
    assert not np.allclose(np.asarray(a), np.asarray(b))
