"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

The correctness suite mirrors the reference's float64 golden values, so it
runs in x64 mode on the CPU backend (TPU f64 is emulated). Sharding tests
use the 8 virtual CPU devices.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_enable_x64", True)
