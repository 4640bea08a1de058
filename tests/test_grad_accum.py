"""--grad_accum: N microbatches scanned inside the ONE jitted diffusion
train step (trainers/diffusion.py grads_and_metrics).

The contract under test: the scanned, valid-count-weighted accumulation is
EXACTLY the global masked-mean loss/grads over all microbatches (each
microbatch's rng = fold_in(step_rng, i)) — not an approximation — including
when padding rows concentrate in one microbatch. Verified against an
independent Python-loop recomputation of the same estimator.

The reference has no equivalent (its budgets fit 128² CUDA memory,
reference config.py:58-70); this is the single-chip memory lever that makes
512²+ global batches trainable together with --remat (docs/DESIGN.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tedm_tpu.config import Config
from tedm_tpu.models.diffusion import train_loss
from tedm_tpu.ops.schedules import make_schedule
from tedm_tpu.trainers import diffusion as D


def _small_config(**kw):
    base = dict(
        experiment="img_only", img_size=16, dim=8, dim_mults=(1, 2),
        timesteps=10, batch_size=8, num_workers=1, synthetic_data=True,
    )
    base.update(kw)
    return Config(**base)


def test_grad_accum_matches_global_masked_mean():
    """accum=4 over batch 8 with padding rows ([1,1,1,1,1,0,0,0] — the last
    microbatch is ALL padding) reproduces the global masked mean computed by
    an independent per-microbatch loop: loss exactly, grads to scan
    reassociation noise. tx=SGD(1.0) makes the step's param delta equal the
    gradient, so the identity is checked through the real jitted step."""
    config = _small_config(grad_accum=4)
    unet = D.build_model(config)
    sched = make_schedule(config.timesteps, config.beta_schedule)
    tx = optax.sgd(1.0)
    train_step, _, _ = D.make_steps(config, unet, sched, tx)

    rng = jax.random.PRNGKey(0)
    params = unet.init(
        rng, jnp.zeros((1, 16, 16, 1)), jnp.zeros((1,), jnp.int32)
    )["params"]
    params0 = jax.tree_util.tree_map(np.asarray, params)
    opt_state = tx.init(params)

    x = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 1), jnp.float32)
    )
    valid = np.array([1, 1, 1, 1, 1, 0, 0, 0], np.float32)
    cond = np.zeros((1,), np.float32)
    step_rng = jax.random.PRNGKey(7)

    # Independent recomputation FIRST (the jitted step donates params):
    # plain Python loop over microbatches, the same per-microbatch estimator
    # train_loss computes, combined as the global masked mean (weight = the
    # microbatch's own denominator).
    def loss_i(p, x_i, v_i, r):
        return train_loss(
            lambda xx, tt, **kw: unet.apply({"params": p}, xx, tt, **kw),
            sched, r, x_i, objective=config.objective,
            normalize=config.normalize, valid=v_i,
        )

    g_sum = jax.tree_util.tree_map(lambda a: np.zeros_like(np.asarray(a)), params0)
    l_sum, d_sum = 0.0, 0.0
    for i in range(4):
        x_i, v_i = x[2 * i : 2 * i + 2], valid[2 * i : 2 * i + 2]
        r_i = jax.random.fold_in(step_rng, i)
        l_i, g_i = jax.value_and_grad(loss_i)(params, x_i, v_i, r_i)
        w_i = max(float(v_i.sum()), 1.0)
        g_sum = jax.tree_util.tree_map(
            lambda a, g: a + w_i * np.asarray(g), g_sum, g_i
        )
        l_sum += w_i * float(l_i)
        d_sum += float(v_i.sum())
    denom = max(d_sum, 1.0)

    new_params, _, loss, _ = train_step(params, opt_state, x, cond, valid, step_rng)
    got_grads = jax.tree_util.tree_map(
        lambda a, b: a - np.asarray(b), params0, new_params
    )

    assert np.isfinite(float(loss))
    assert abs(float(loss) - l_sum / denom) < 1e-6 * max(abs(l_sum / denom), 1.0)
    flat_got = jax.tree_util.tree_leaves(got_grads)
    flat_exp = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda g: g / denom, g_sum)
    )
    assert len(flat_got) == len(flat_exp)
    for a, b in zip(flat_got, flat_exp):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-7)


def test_grad_accum_trainer_cli_composes_with_remat_and_fsdp(tmp_path):
    """--grad_accum 2 through the real trainer CLI, stacked with --remat and
    FSDP on the 8-device mesh: the composition the flag exists for (memory
    levers + sharding in one step). Trains, logs finite losses, and the
    run is seed-deterministic."""
    from tedm_tpu.train import main as train_main
    import json
    import os

    args = [
        "--experiment", "img_only", "--synthetic_data", "--dim", "8",
        "--dim_mults", "1", "2", "--img_size", "16", "--batch_size", "8",
        "--timesteps", "10", "--num_workers", "1", "--val_steps", "5",
        "--max_val_steps", "1", "--n_sampled_imgs", "2",
        "--max_steps", "6", "--val_freq", "6", "--log_freq", "2",
        "--grad_accum", "2", "--remat",
        "--param_sharding", "fsdp", "--fsdp_min_size", "64",
    ]

    def losses(run):
        with open(os.path.join(run, "metrics.jsonl")) as f:
            return [json.loads(l)["train/loss"] for l in f if "train/loss" in l]

    train_main(args + ["--log_dir", str(tmp_path / "a")])
    l_a = losses(str(tmp_path / "CXR14" / "a"))
    assert len(l_a) == 3 and all(np.isfinite(l) and l > 0 for l in l_a)

    train_main(args + ["--log_dir", str(tmp_path / "b")])
    l_b = losses(str(tmp_path / "CXR14" / "b"))
    assert l_a == l_b  # same seed, same microbatch rng folds -> same run


def test_grad_accum_config_validation():
    with pytest.raises(ValueError):
        _small_config(grad_accum=0)
    with pytest.raises(ValueError):
        _small_config(grad_accum=3)  # batch_size 8 not divisible
    assert _small_config(grad_accum=2).grad_accum == 2


def test_grad_accum_rejected_for_batchnorm_trainers():
    """Non-diffusion experiments fail fast instead of silently ignoring the
    flag: their heads use BatchNorm, whose batch statistics are not
    microbatch-decomposable (train.py dispatch guard)."""
    from tedm_tpu.train import dispatch

    for exp in ("baseline", "TEDM", "global_cl"):
        with pytest.raises(ValueError, match="grad_accum"):
            dispatch(_small_config(experiment=exp, grad_accum=2))
