"""Test config: run JAX on a virtual 8-device CPU mesh (no TPU needed).

This image pre-imports jax at interpreter startup (TPU tunnel backend), so
setting JAX_PLATFORMS in os.environ here is too late; instead we flip the
already-imported jax to CPU via config.update. XLA_FLAGS still works because
the CPU client is created lazily on first use.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache makes repeated suite runs cheap on this 1-core host
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
