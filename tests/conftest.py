import os

# Tests run on a virtual 8-device CPU mesh with float64 enabled so we can
# check numerics against the f64 C++ reference. TPU execution paths are
# exercised by bench.py / __graft_entry__.py.
#
# A pytest plugin may import jax (and even initialize the TPU backend)
# before this conftest runs, so setting the env var alone is not enough:
# force the platform through the config API and drop any live backends.
os.environ["JAX_PLATFORMS"] = "cpu"
# the axon TPU plugin can hang in discovery when the tunnel is busy, even
# under JAX_PLATFORMS=cpu; an empty pool disables it
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8")
if "xla_cpu_max_isa" not in flags:
    # this host's cpuinfo advertises AMX but executing AMX code traps:
    # XLA:CPU's own AOT loader warns "machine type ... doesn't match",
    # and late-suite compiles segfaulted inside backend_compile_and_load
    # until codegen was capped at AVX512
    flags = flags + " --xla_cpu_max_isa=AVX512"
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    import jax.extend.backend

    jax.extend.backend.clear_backends()
except Exception:
    pass
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: REQUIRED for suite stability on this
# jaxlib, not just speed — compiling a large executable late in a
# long-lived process segfaults inside backend_compile_and_load
# (reproduced at the same suite position across five full runs after a
# cache purge; each test passes in isolation).  Cache loads avoid the
# late live compiles.  Populate a cold cache file-by-file (fresh
# interpreter per file):  for f in tests/test_*.py; do
#   python -m pytest "$f" -q -m "not slow"; done
# The mesh tests additionally re-run themselves in fresh interpreters
# with the cache OFF: serializing a mesh-sharded CPU executable is the
# other reproducible crash (compilation_cache.put_executable_and_time).
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "cpu", jax.devices()

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")
GOLDDIR = os.path.join(os.path.dirname(__file__), "golden")
