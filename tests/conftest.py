"""Test configuration: force an 8-device virtual CPU platform.

Tests run on CPU for determinism/speed and to exercise the multi-chip
sharding paths (SURVEY.md section 4: distributed tests via a virtual device
mesh). Benchmarks (bench.py) run on the real TPU chip instead.

NOTE: this environment pre-imports jax with JAX_PLATFORMS=axon (a tunneled
TPU), so env vars alone don't stick — we must override through jax.config
before any backend initialization.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy tests (dense goldens, distributed suites). Fast edit "
        "loop: pytest -m 'not slow'; the FULL suite is the pre-commit gate.")
