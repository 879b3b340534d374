import os

# Tests run on a virtual 8-device CPU mesh with float64 enabled so we can
# check numerics against the f64 C++ reference. TPU execution paths are
# exercised by bench.py / __graft_entry__.py.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")
GOLDDIR = os.path.join(os.path.dirname(__file__), "golden")
