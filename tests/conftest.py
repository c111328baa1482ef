"""Test environment: force a TRUE CPU backend with 8 virtual devices so
sharding tests run without TPU hardware (SURVEY.md §4.4).

Note: this image's sitecustomize registers the 'axon' TPU PJRT plugin at
interpreter start and pins JAX_PLATFORMS=axon; overriding via
jax.config.update before the first backend initialization wins (the env var
alone does not).
"""
import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
# TPU's default matmul precision is bf16; parity tests against float32 torch
# oracles need true f32 matmuls regardless of backend.
jax.config.update("jax_default_matmul_precision", "float32")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end tests (CLI drives, "
        "reference golden parity)")
    config.addinivalue_line(
        "markers", "smoke: <60s commit gate (field evaluators both modes, "
        "fused level path, multichip dryrun) — run via tools/smoke.sh")
