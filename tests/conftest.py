"""Test configuration: run everything on CPU with 8 virtual devices.

Real-TPU execution is exercised by bench.py / the driver; unit tests validate
numerics and sharding on the host platform so they are fast and hermetic.

Note: this environment's sitecustomize registers a remote TPU backend and
forces jax_platforms via jax.config (not the env var), so we must override
through jax.config *after* importing jax, before any backend is initialized.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite compiles many render/train variants;
# caching them across runs cuts wall time dramatically.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.devices()[0].platform == "cpu", (
    f"tests must run on CPU, got {jax.devices()}"
)
