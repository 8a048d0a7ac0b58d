"""Test configuration: run on a virtual 8-device CPU mesh.

Set before any jax import so that sharding tests exercise real multi-device
paths without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The hosting environment's sitecustomize registers the TPU platform and
# overwrites jax_platforms; force CPU after import, before backend init.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

# Persistent compilation cache: the suite compiles the full model dozens of
# times across files/sessions; a warm cache cuts total wall time severalfold
# (same recipe as bench.py).  Safe across processes — entries key on HLO.
_cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                            "/tmp/vlsat_jax_cache_tests")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass  # older jax without these flags


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: production-shape sharded certification (minutes cold, fast "
        "under the persistent compile cache)")
