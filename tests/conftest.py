"""Test configuration: run on a virtual 8-device CPU mesh in float64.

The TPU production path runs float32 (+ float64 polish); tests validate
numerical parity with the reference semantics in float64 on the XLA CPU
backend, and multi-chip sharding on 8 virtual host devices
(xla_force_host_platform_device_count).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # parity tests run on the XLA CPU backend
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# sitecustomize may import jax before this file runs, baking JAX_PLATFORMS
# into the config — override through the config API, not the env var.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
