"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
paths can be exercised without TPU hardware (the driver separately dry-runs the
multichip path)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# The hosted TPU tunnel ignores JAX_PLATFORMS; pin the default device to the
# local CPU backend so tests compile locally (and can use complex128).
jax.config.update("jax_default_device", jax.devices("cpu")[0])
