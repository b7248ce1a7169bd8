"""Global numerical configuration for pymes_tpu.

The reference code (nickirk/pymes) relies on numpy float64 throughout and its
test oracles require 1e-6..1e-8 Ha agreement (see BASELINE.md).  On TPU the MXU
natively computes in f32/bf16, so we run the framework in two precision modes:

* ``x64`` (default): ``jax_enable_x64`` is switched on at import time.  On CPU
  this is native double precision; on TPU XLA emulates f64 for elementwise ops
  and we route the hot contractions through compensated (double-single)
  Pallas/XLA paths (see :mod:`pymes_tpu.ops`).
* ``x32``: single precision end-to-end, for speed benchmarking.

Nothing in the library should call ``jax.config.update`` after import —
flip :func:`use_x64` before constructing arrays.
"""

import os

import jax

_X64_ENABLED = False


def enable_x64() -> None:
    """Enable double precision globally (idempotent)."""
    global _X64_ENABLED
    if not _X64_ENABLED:
        jax.config.update("jax_enable_x64", True)
        _X64_ENABLED = True


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


# Unless explicitly disabled, the library runs in f64 — the correctness bar of
# the reference test-suite (1e-8 Ha) cannot be met in f32.
if os.environ.get("PYMES_TPU_X32", "0") != "1":
    enable_x64()

# Persistent compilation cache: through the axon remote-compile tunnel a
# fresh-process compile of a solver graph costs 30–600 s; the on-disk cache
# brings it to <1 s (measured 78.7 s → 0.8 s).  Harmless on CPU.
try:
    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("PYMES_TPU_CACHE",
                           os.path.expanduser("~/.cache/jax_pymes")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - older jax without the knob
    pass
