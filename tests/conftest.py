"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on CPU (no multi-chip TPU hardware in
CI). The environment's axon TPU plugin registers itself in every
process and overrides JAX_PLATFORMS, so we additionally pin the JAX
default device to CPU after import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
try:
    _cpu0 = jax.devices("cpu")[0]
    jax.config.update("jax_default_device", _cpu0)
except Exception:
    pass


def cpu_devices(n=8):
    return jax.devices("cpu")[:n]
