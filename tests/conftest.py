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
# is >1h, which stops being run; these modules gate every change cheaply.
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


def pytest_collection_modifyitems(items):
    for item in items:
        mod = getattr(item, "module", None)
        if mod is not None and mod.__name__ in _QUICK_MODULES:
            item.add_marker(pytest.mark.quick)
