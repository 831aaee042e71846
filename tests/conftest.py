"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so sharding/collective code paths can
be exercised without TPU hardware; numerics stay float32 to match device
behavior on TPU.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
# Force CPU. The surrounding environment registers a remote-TPU PJRT plugin at
# interpreter startup (sitecustomize) and force-updates jax_platforms
# programmatically, so the env var alone is not enough — override the config
# knob itself before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
