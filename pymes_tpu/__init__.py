"""pymes_tpu — a TPU-native many-electron (post-Hartree-Fock) framework.

A ground-up JAX/XLA rebuild with the capabilities of PyMES
(nickirk/pymes): MP2, (dr)CCD/DCD, CCSD/DCSD ground states with DIIS;
EOM-CCSD (Davidson), FEAST-EOM-CCSD (contour-integral energy filtering) and
CIF real-time EOM-CCSD excited-state dynamics; non-Hermitian transcorrelated
Hamiltonians with 3-body integral contractions; a 3D uniform-electron-gas
model Hamiltonian with plane-wave bases, correlators and twist averaging;
and FCIDUMP/TCDUMP interfaces.

Design (TPU-first, not a port):

* residual/sigma builders are pure jitted functions over named integral
  blocks; amplitude iterations are ``lax.while_loop`` fixed-point solves that
  carry the DIIS ring buffer on device;
* the distributed tensor role of CTF (C++/MPI) in the reference is played by
  ``jax.sharding`` meshes: V/T tensors sharded over virtual-orbital axes,
  contractions lowered to XLA collectives over ICI (``pymes_tpu.parallel``);
* hot contractions run exact f64 on the MXU through the Ozaki sliced
  engine (``pymes_tpu.ops.ozaki``: 6-bit mantissa slices in bf16, exact
  f32 accumulation) and the momentum-block-diagonal sector-GEMM ladder
  (``pymes_tpu.ops.ueg_ladder``) — this design replaced custom Pallas
  kernels on every production path (benchmarks/RESULTS.md round 2).
"""

from pymes_tpu import config  # noqa: F401  (side effect: enable x64)

__version__ = "0.1.0"
