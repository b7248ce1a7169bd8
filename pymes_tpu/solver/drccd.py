"""Direct-ring CCD (drCCD) — the RPA-like ring-only channel.

Equation parity with ``pymes/solver/drccd.py:10,41``: only direct ring
diagrams enter the residual and the energy has no exchange part (drCCD total
energy equals dRPA).
"""

import jax
import jax.numpy as jnp


@jax.jit
def residual(t_epsilon_i, t_epsilon_a, t_T_abij, t_V_abij, t_V_iabj,
             t_V_ijab):
    """drCCD residual: driver + Fock + left/right rings + quadratic ring.

    Note the reference builds the ring terms from ``V_aijb``/``V_iabj``
    ("akic"/"kbcj"); for the UEG and Hermitian Hamiltonians used with drCCD
    these coincide with the re-sliced ``iabj`` blocks used here.
    """
    f_ab = jnp.diag(t_epsilon_a)
    f_ij = jnp.diag(t_epsilon_i)
    R = t_V_abij
    R = R + jnp.einsum("ad,dbij->abij", f_ab, t_T_abij)
    R = R - jnp.einsum("ik,abkj->abij", f_ij, t_T_abij)
    R = R + jnp.einsum("bd,daji->abij", f_ab, t_T_abij)
    R = R - jnp.einsum("jk,baki->abij", f_ij, t_T_abij)
    # left and right ring couplings: V_aijb("akic") = <ak|ic> = iabj("kaci")
    R = R + 2.0 * jnp.einsum("kaci,cbkj->abij", t_V_iabj, t_T_abij)
    R = R + 2.0 * jnp.einsum("kbcj,acik->abij", t_V_iabj, t_T_abij)
    R = R + 4.0 * jnp.einsum("acik,klcd,dblj->abij", t_T_abij, t_V_ijab,
                             t_T_abij)
    return R


def get_residual(tEpsilon_i, tEpsilon_a, tT_abij, tV_abij, tV_aijb, tV_iabj,
                 tV_ijab):
    """Reference-signature wrapper (``drccd.get_residual``)."""
    return residual(tEpsilon_i, tEpsilon_a, tT_abij, tV_abij, tV_iabj,
                    tV_ijab)


@jax.jit
def getEnergy(tT_abij, tV_ijab):
    e_dir = 2.0 * jnp.einsum("abij,ijab->", tT_abij, tV_ijab)
    return [e_dir, 0.0]
