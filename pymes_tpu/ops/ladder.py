"""Particle-particle ladder contraction  R_abij += Σ_cd V_abcd T_cdij.

This is the FLOP hot spot of every CC doubles iteration — O(nv⁴no²), the
reference's ``einsum("abcd,cdij->abij")`` at ``pymes/solver/ccd.py:187``.
On TPU it is exactly one large matmul: (nv², nv²) × (nv², no²), which the MXU
eats whole.  Three execution paths:

* ``xla`` (default): a single ``dot_general`` in the working dtype; in f64
  XLA emulates on TPU (slow but exact), on CPU it is native.
* ``pallas_f32``: tiled Pallas matmul in f32 with f32 accumulation — the
  speed-of-light single-chip path for benchmarking.
* ``pallas_ds``: double-single (two-float) compensated Pallas kernel: f64
  operands split into hi/lo f32 parts, products accumulated as
  hi·hi + hi·lo + lo·hi on the MXU — ~1e-14 relative accuracy at roughly
  3 matmuls' cost, meeting the 1e-8 Ha bar without f64 emulation.

The mode is a module-level switch so solvers stay pure.
"""

import jax
import jax.numpy as jnp

_MODE = "xla"
_VALID = ("xla", "pallas_f32", "pallas_ds")


def set_mode(mode: str) -> None:
    global _MODE
    if mode not in _VALID:
        raise ValueError(f"ladder mode must be one of {_VALID}")
    _MODE = mode


def get_mode() -> str:
    return _MODE


def ppl_contract(V_abcd, T_cdij):
    """R_abij = Σ_cd V_abcd T_cdij via the active execution path."""
    if _MODE == "xla":
        return jnp.einsum("abcd,cdij->abij", V_abcd, T_cdij)
    nv = V_abcd.shape[0]
    no = T_cdij.shape[-1]
    A = V_abcd.reshape(nv * nv, nv * nv)
    B = T_cdij.reshape(nv * nv, no * no)
    if _MODE == "pallas_f32":
        from pymes_tpu.ops.matmul import matmul_f32
        C = matmul_f32(A.astype(jnp.float32), B.astype(jnp.float32))
        C = C.astype(V_abcd.dtype)
    else:  # pallas_ds
        from pymes_tpu.ops.matmul import matmul_ds
        C = matmul_ds(A, B)
    return C.reshape(nv, nv, no, no)
