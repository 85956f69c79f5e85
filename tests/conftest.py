"""Test configuration: force an 8-device virtual CPU platform so multi-chip
sharding tests run anywhere and results are deterministic (real-TPU behaviour
is covered by bench.py).

Note: the TPU environment ships an 'axon' PJRT plugin that overrides the
JAX_PLATFORMS env var, so the platform must be forced through jax.config
after import as well.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
