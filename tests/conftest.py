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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    import jax.extend.backend

    jax.extend.backend.clear_backends()
except Exception:
    pass
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

assert jax.devices()[0].platform == "cpu", jax.devices()

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")
GOLDDIR = os.path.join(os.path.dirname(__file__), "golden")
