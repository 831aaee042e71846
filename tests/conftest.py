"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so sharding/collective code paths can
be exercised without TPU hardware; numerics stay float32 to match device
behavior on TPU.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
# Force CPU: the surrounding environment pins JAX_PLATFORMS to the (remote) TPU
# platform, which would make every tiny test op compile over the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
