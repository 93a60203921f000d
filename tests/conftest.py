import os

# Validation tests run on a virtual 8-device CPU mesh with float64 available;
# the real-TPU path is exercised by bench.py and __graft_entry__.py.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the column solver takes ~30s to compile on
# CPU; cache it across test runs.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
