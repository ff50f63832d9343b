"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

The correctness suite mirrors the reference's float64 golden values, so it
runs in x64 mode on the CPU backend (TPU f64 is emulated). Sharding tests
use the 8 virtual CPU devices.

Note: this environment's sitecustomize registers a remote-TPU ("axon")
PJRT plugin in every process and forces jax_platforms="axon,cpu"; we
reset it to "cpu" BEFORE the first jax operation so test runs never touch
the TPU tunnel (whose init can stall). Benchmarks (bench.py) run on the
real TPU backend instead.
"""

import os

os.environ.setdefault("ALTRO_SCAN_UNROLL", "1")  # fast compiles; perf-neutral for correctness

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: repeat suite runs skip XLA compilation.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_altro_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
