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

# ALTRO_TPU_TESTS=1 switches the session to the on-device subset: only
# @pytest.mark.tpu tests run (everything else is skipped), on the real
# TPU backend in f32 — the one-command on-hardware regression check
# (kernel parity, tiled boundary, closed-loop tick, hetero-dims solve)
# independent of the bench. Usage on a TPU host:
#   ALTRO_TPU_TESTS=1 python -m pytest tests/ -q -n 0
TPU_MODE = os.environ.get("ALTRO_TPU_TESTS") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if TPU_MODE:
    # real device, f32 (the kernels' native dtype); separate compile cache
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_cache_altro_tpu_tests"))
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    # Persistent compile cache: repeat suite runs skip XLA compilation.
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_cache_altro_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_collection_modifyitems(config, items):
    import pytest

    if TPU_MODE:
        skip = pytest.mark.skip(
            reason="ALTRO_TPU_TESTS=1 runs only the @pytest.mark.tpu subset"
        )
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(
            reason="on-device test; run ALTRO_TPU_TESTS=1 pytest -n 0 on a TPU host"
        )
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)


_last_module = [None]


def pytest_runtest_logstart(nodeid, location):
    """Bound vm map usage (vm.max_map_count default 65530).

    Every XLA-CPU executable JIT-maps ~hundreds of anonymous segment
    triples (measured: one jitted `solve` ~600 maps, device count nearly
    irrelevant), and jax holds every compiled executable for the process
    lifetime — an unbounded full-suite run climbs past the 65530 map
    limit and the NEXT LLVM JIT mmap fails, segfaulting the interpreter
    (observed repeatedly at ~65.2k maps, both in
    backend_compile_and_load and in the persistent-cache executable-
    deserialization path, while the same tests pass in isolation).

    Two mechanisms keep usage structurally bounded:
      * proactive hygiene: at each test-MODULE boundary with >25k maps,
        drop the executable caches (jax.clear_caches + gc: 6058 -> 530
        maps, measured). Executables are rarely shared across modules,
        so this costs almost nothing and keeps the count far from the
        limit;
      * emergency guard at 40k maps mid-module (should never fire with
        the module-boundary hygiene in place).

    ALTRO_TRACE_MAPS=1 additionally logs the per-test map count (plus a
    CLEAR marker at each cache drop).
    """
    import gc
    import os

    with open("/proc/self/maps") as f:
        n = sum(1 for _ in f)
    module = nodeid.split("::", 1)[0]
    module_boundary = module != _last_module[0]
    _last_module[0] = module
    cleared = ""
    if (module_boundary and n > 25000) or n > 40000:
        import jax

        jax.clear_caches()
        gc.collect()
        cleared = "\tCLEAR-module" if module_boundary else "\tCLEAR-EMERGENCY"
    if os.environ.get("ALTRO_TRACE_MAPS") == "1":
        with open("/tmp/altro_maps.log", "a") as f:
            f.write(f"{n}\t{nodeid}{cleared}\n")
