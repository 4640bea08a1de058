"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run anywhere (no TPU needed), per the multi-host test strategy in SURVEY §4.

Note: this image's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS pointing at the TPU tunnel, so env vars set here are too
late — the override must go through jax.config (backends are not
initialized until first use, so this still takes effect)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import pytest  # noqa: E402

# Fast unit tier: `pytest -m quick` (<5 min on this host) — the full suite
# is ~52 min, which stops being run; these modules gate every change cheaply.
_QUICK_MODULES = {
    "test_schedules",
    "test_config",
    "test_metrics",
    "test_data",
    "test_make_splits",
    "test_logging",
    "test_unet",
    "test_parallel",
    "test_quick_smoke",
}

# Slow tier (VERDICT r4 #5): modules that run full trainer chains — CLI
# subprocess runs, multi-process meshes, train->checkpoint->eval loops —
# each paying a fresh jax import and/or 8-device compile. Deselected by
# DEFAULT (pyproject addopts `-m "not slow"`) so `pytest tests/ -q` is the
# <15-min gate; the full suite (pre-snapshot gate, ~52 min) runs with
#   pytest tests/ -q -m "slow or not slow"
_SLOW_MODULES = {
    "test_trainers",
    "test_dp_training",
    "test_multihost",
    "test_interrupt",
    "test_ema",
    "test_grad_accum",
    "test_conditional",
    "test_finetune_eval",
    "test_contrastive",
    "test_eval_harness",
    "test_serve",
    "test_export",
}


def pytest_collection_modifyitems(items):
    for item in items:
        mod = getattr(item, "module", None)
        if mod is not None and mod.__name__ in _QUICK_MODULES:
            item.add_marker(pytest.mark.quick)
        if mod is not None and mod.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
