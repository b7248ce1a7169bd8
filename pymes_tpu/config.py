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
