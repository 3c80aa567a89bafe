"""Test configuration: force CPU with 8 simulated devices, enable x64.

Tests run on a virtual 8-device CPU mesh (SURVEY.md §4 item 4) so sharded
training can be validated without TPU hardware, and with x64 enabled so the
float64 golden-parity harness matches the reference's Theano float64 math.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu" via
# jax.config, overriding the env var — override it back so tests never touch
# the tunneled TPU device.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute e2e/ensemble/multihost tests. Quick tier "
        "(~3 min): python -m pytest tests/ -q -m 'not slow'")
