import os

# Validation tests run on a virtual 8-device CPU mesh with float64 available;
# the real-TPU path is exercised by bench.py and __graft_entry__.py.
# NOTE: this image's sitecustomize imports jax at interpreter start (TPU
# plugin registration), so JAX_PLATFORMS in os.environ is already consumed —
# switch platform via jax.config instead.  XLA_FLAGS still works because the
# CPU backend initializes lazily.
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS",
                                                                ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the column solver takes ~30s to compile on
# CPU; cache it across test runs.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
