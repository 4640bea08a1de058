"""Config system tests: CLI parity, presets, round-trip, diffing."""

from tedm_tpu.config import Config, config_from_args, diff_configs


def test_defaults_match_reference():
    c = Config()
    # reference config.py defaults
    assert c.img_size == 128
    assert c.dim == 64
    assert c.dim_mults == (1, 2, 4, 8)
    assert c.timesteps == 1000
    assert c.beta_schedule == "cosine"
    assert c.objective == "pred_noise"
    assert c.batch_size == 16
    assert c.lr == 1e-4
    assert c.max_steps == 500_000
    assert c.log_freq == 100 and c.val_freq == 100
    assert c.t_steps_to_save == (50, 200, 400, 600, 800)
    assert c.seed == 0


def test_tedm_preset():
    c = config_from_args(["--experiment", "TEDM", "--n_labelled_images", "3"])
    assert c.shared_weights_over_timesteps is True
    assert c.t_steps_to_save == (1, 10, 25, 50, 200, 400, 600, 800)
    assert c.normalize is True and c.channels == 1 and c.out_channels == 1
    assert "/TEDM/3/" in c.log_dir


def test_ledm_preset():
    c = config_from_args(["--experiment", "LEDM"])
    assert c.t_steps_to_save == (50, 150, 250)
    assert c.shared_weights_over_timesteps is False


def test_img_only_logdir():
    c = config_from_args(["--experiment", "img_only", "--dataset", "CXR14"])
    assert "/CXR14/" in c.log_dir


def test_json_roundtrip():
    c = config_from_args(["--experiment", "TEDM", "--lr", "3e-4"])
    c2 = Config.from_json(c.to_json())
    assert c == c2


def test_diff_configs():
    a = Config()
    b = a.replace(lr=5e-4, dim=32)
    msgs = []
    changed = diff_configs(a, b, printer=msgs.append)
    assert set(changed) == {"lr", "dim"}
    assert any("lr" in m for m in msgs)


def test_feature_channels():
    c = Config()
    assert c.feature_channels_per_step == 960
    assert config_from_args(["--experiment", "TEDM"]).n_feature_steps == 8
    assert config_from_args(["--experiment", "LEDM"]).n_feature_steps == 3


def test_unknown_keys_ignored():
    c = Config.from_dict({"lr": 1.0, "bogus_key": 42})
    assert c.lr == 1.0


def test_pallas_kernel_flags_reach_config():
    from tedm_tpu.config import config_from_args

    cfg = config_from_args([
        "--experiment", "baseline", "--use_pallas_resblock",
        "--use_pallas_groupnorm", "--debug",
    ])
    assert cfg.use_pallas_resblock and cfg.use_pallas_groupnorm
    assert config_from_args(["--experiment", "baseline", "--debug"]).use_pallas_resblock is False


def test_ema_decay_validated():
    """ADVICE r3: ema_decay >= 1.0 silently freezes the EMA at init weights;
    the config must reject it at construction."""
    import pytest

    with pytest.raises(ValueError):
        Config(ema_decay=1.0)
    with pytest.raises(ValueError):
        Config(ema_decay=-0.1)
    assert Config(ema_decay=0.9999).ema_decay == 0.9999
    assert Config(ema_decay=0.0).ema_decay == 0.0


def test_extract_unnormalized_flag():
    """The parity switch (RESULTS_parity.md mechanism): CLI parses it, the
    TEDM preset leaves it alone, and it actually changes the features the
    datasetdm task computes (reference defect: datasetDM_model.py:77
    bypasses the [0,1]->[-1,1] normalize of diffusion_model.py:169)."""
    from tedm_tpu.config import config_from_args

    cfg = config_from_args([
        "--experiment", "TEDM", "--extract_unnormalized",
        "--n_labelled_images", "1",
    ])
    assert cfg.extract_unnormalized and cfg.normalize
    assert not config_from_args(["--experiment", "TEDM",
                                 "--n_labelled_images", "1"]).extract_unnormalized

    # embedded-config roundtrip (eval rebuilds the task from this)
    from tedm_tpu.config import Config
    assert Config.from_json(cfg.to_json()).extract_unnormalized

    import jax
    import jax.numpy as jnp
    from tedm_tpu.trainers.datasetdm import build_task

    base = cfg.replace(
        dim=8, dim_mults=(1, 2), img_size=16, timesteps=10,
        t_steps_to_save=(1, 5), saved_diffusion_model="/nonexistent",
        use_pallas=False,
    )
    rng = jax.random.PRNGKey(0)
    x = jnp.linspace(0, 1, 16 * 16, dtype=jnp.float32).reshape(1, 16, 16, 1)
    out = {}
    for flag in (False, True):
        task = build_task(base.replace(extract_unnormalized=flag), rng)
        logits, _ = task.apply(task.params, task.batch_stats, x,
                               jax.random.PRNGKey(1), False)
        out[flag] = logits
    assert not jnp.allclose(out[False], out[True])
