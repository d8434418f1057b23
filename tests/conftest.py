"""Test harness configuration.

- Runs on a *virtual 8-device CPU mesh* (``xla_force_host_platform_device_count``)
  so multi-chip sharding paths execute without TPU hardware, as the driver does.
- Enables float64 (``jax_enable_x64``) to match the reference test suite's
  ``torch.set_default_dtype(torch.float64)`` oracle tolerance (1e-7..1e-9).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
