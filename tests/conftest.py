"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on fake CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8) since only one real
TPU chip is available; `__graft_entry__.dryrun_multichip` uses the same
mechanism.
"""

import os
import sys

# Hard-set: the session environment pre-sets JAX_PLATFORMS=axon (TPU tunnel),
# and the axon plugin ignores the env var — the config update below is the
# only reliable way to force the CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dcta_jax_cache")

import jax  # noqa: E402

# env-var cache config does not reliably initialize the persistent cache
# (see cli/main.py); set it explicitly so repeated test runs share compiles
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
assert jax.devices()[0].platform == "cpu"
