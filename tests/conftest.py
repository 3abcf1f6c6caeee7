"""Test configuration: CPU backend with a virtual 8-device mesh.

The environment's TPU plugin force-selects itself via sitecustomize
(jax.config jax_platforms), so env vars alone don't stick -- override the
config back to CPU before any backend initializes.  The 8 virtual CPU
devices are the standard way to test pod sharding without TPU hardware.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The box exports JAX_PLATFORMS=axon (remote TPU) globally.  Force the
# env var to cpu too: in-process cli.main() calls consult it
# (cli._ensure_backend) and would otherwise probe the tunnel -- 60 s per
# call when it is down -- and subprocesses the tests spawn inherit it.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the entropy engines' scan programs take
# minutes each to compile on this 1-core box; repeat test runs must not
# pay that again (the cache key covers backend/flags, so CPU and TPU
# entries coexist).
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
