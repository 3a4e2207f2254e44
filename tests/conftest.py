"""Test configuration: force a clean CPU backend with 8 virtual devices (for
sharding tests) and float64 enabled (golden-parity tolerances need it).

The container boots every python process with an `axon` TPU PJRT plugin via a
sitecustomize hook (PYTHONPATH=/root/.axon_site) that would silently hijack
computation onto the tunneled TPU in float32. jax is already imported by that
hook when conftest runs, but backends initialize lazily — overriding
``jax_platforms`` via jax.config (which beats the hook's env) pins us to CPU.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache (VERDICT r2 next #4): the integrator while_loop
# compiles in ~20-60 s on this 2-core box and module-scoped fixtures recompile
# it per file; with the cache, repeat compilations deserialize in ~1 s. The
# cache directory is shared with bench.py (entries are keyed by platform).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"),
)
# READ-ONLY in the test process: XLA:CPU `executable.serialize()` segfaults
# intermittently inside long pytest runs on this host (three full golden-tier
# runs died in `put_executable_and_time` — SIGABRT ×1, SEGV ×2, with and
# without concurrent processes). Reads are unaffected; cache entries are
# populated by the (short-lived, crash-free) bench/debug scripts instead.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()}, devices: {jax.device_count()}"
