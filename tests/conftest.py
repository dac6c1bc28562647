"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding paths are validated
on host-platform virtual devices (SURVEY.md §4 test-strategy note).

The ambient environment pins ``JAX_PLATFORMS=axon`` (a tunneled real TPU
chip) and its site hook re-asserts it programmatically, so we must both
set the env var and override ``jax_platforms`` via ``jax.config`` after
import — otherwise every test compiles over the TPU tunnel.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# Fast-compile mode for the CPU test backend: the suite is
# ~371 jit-compile-bound default-tier tests on a 1-CPU CI box; optimization level 0 +
# cheap LLVM passes cut cold compile ~36 % (measured) and every oracle/
# torch-parity/DP-equality test still passes — test-only, production
# flags are untouched.
if ("xla_backend_optimization_level" not in _flags
        and not os.environ.get("SV_TPU_KEEP_XLA_FLAGS")):
    # SV_TPU_KEEP_XLA_FLAGS=1 opts out (the O2 numeric canary in
    # test_frontend.py re-runs oracle tests at the default pipeline)
    _flags += (" --xla_backend_optimization_level=0"
               " --xla_llvm_disable_expensive_passes=true")
os.environ["XLA_FLAGS"] = _flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: model-compile-heavy tests dominate the
# suite's runtime; repeat runs hit the cache instead of recompiling
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("SVTPU_JAX_CACHE", "/tmp/svtpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8
