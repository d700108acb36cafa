import os
import sys

# Multi-device tests run on a virtual 8-device CPU mesh (the TPU-world
# equivalent of a fake backend); parity tests need f64.  The environment's
# sitecustomize force-registers the remote "axon" TPU platform and overrides
# JAX_PLATFORMS via jax.config, so the override must go through jax.config
# too — before any backend is initialized.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the parity tier's wall is dominated by
# multi-minute XLA:CPU compiles of the DF polish graphs (round-4 VERDICT
# weak item 3); caching them makes re-runs compile-free.  Same knobs the
# TPU probes use (scripts/probe_*.py).
cache_dir = os.environ.get("TRAOPT_TEST_CACHE", "/tmp/traopt_test_jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
assert jax.default_backend() == "cpu"
