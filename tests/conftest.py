"""Test configuration: CPU backend with 8 virtual devices.

Correctness oracles need native float64 (1e-8 Ha bar), so tests run on the
CPU backend; multi-chip sharding tests use an 8-device virtual CPU mesh.
The real-TPU path is exercised by bench.py / __graft_entry__.py.

Note: the environment pins ``JAX_PLATFORMS=axon`` and preloads jax via
sitecustomize, so the platform must be overridden through ``jax.config``
(env vars are too late / ignored here).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# CPU-specific compilation cache: the shared default dir also receives
# entries from the axon remote-compile helper whose host CPU features
# differ (XLA warns about SIGILL risk when loading them)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_pymes_cpu"))

import pymes_tpu  # noqa: E402,F401  (enables x64)
