"""Direct-ring CCD (drCCD) — the RPA-like ring-only channel.

Equation parity with ``pymes/solver/drccd.py:10,41``: only direct ring
diagrams enter the residual and the energy has no exchange part (drCCD total
energy equals dRPA).  Unlike the reference (whose test asserts nothing), the
ring prefactors here are fixed to satisfy the dRPA plasmon identity
(``tests/test_drccd.py``).
"""

import jax
import jax.numpy as jnp


@jax.jit
def residual(t_epsilon_i, t_epsilon_a, t_T_abij, t_V_abij, t_V_iabj,
             t_V_ijab, t_V_aijb=None):
    """drCCD residual: driver + Fock + left/right rings + quadratic ring.

    The left ring needs ``V_aijb`` (reference "akic",
    ``pymes/solver/drccd.py:34``).  When ``t_V_aijb`` is not supplied it is
    derived from ``t_V_iabj`` by the *particle-exchange* identity
    ``<ak|ic> = <ka|ci>`` (relabeling the two integration variables), i.e.
    ``V_aijb[a,k,i,c] = V_iabj[k,a,c,i]``.  This holds for ANY two-body
    vertex whose kernel is symmetric under particle exchange
    (``V_pqrs = V_qpsr``) — including the non-Hermitian transcorrelated UEG
    class, where both the transfer momentum q and the (k_r−k_s) factor flip
    sign under the exchange (``models/ueg.py``).  It does NOT require
    Hermiticity.  Callers with a vertex that breaks particle-exchange
    symmetry must pass ``t_V_aijb`` explicitly (``get_residual`` does).
    """
    f_ab = jnp.diag(t_epsilon_a)
    f_ij = jnp.diag(t_epsilon_i)
    if t_V_aijb is None:
        # particle-exchange transpose: V_aijb[a,k,i,c] = V_iabj[k,a,c,i]
        t_V_aijb = jnp.transpose(t_V_iabj, (1, 0, 3, 2))
    R = t_V_abij
    R = R + jnp.einsum("ad,dbij->abij", f_ab, t_T_abij)
    R = R - jnp.einsum("ik,abkj->abij", f_ij, t_T_abij)
    R = R + jnp.einsum("bd,daji->abij", f_ab, t_T_abij)
    R = R - jnp.einsum("jk,baki->abij", f_ij, t_T_abij)
    # left and right ring couplings (reference "akic" / "kbcj")
    R = R + 2.0 * jnp.einsum("akic,cbkj->abij", t_V_aijb, t_T_abij)
    R = R + 2.0 * jnp.einsum("kbcj,acik->abij", t_V_iabj, t_T_abij)
    R = R + 4.0 * jnp.einsum("acik,klcd,dblj->abij", t_T_abij, t_V_ijab,
                             t_T_abij)
    return R


def get_residual(tEpsilon_i, tEpsilon_a, tT_abij, tV_abij, tV_aijb, tV_iabj,
                 tV_ijab):
    """Reference-signature wrapper (``drccd.get_residual``): uses the
    caller's ``aijb`` block directly — exact for arbitrary (even
    particle-exchange-breaking) vertices."""
    return residual(tEpsilon_i, tEpsilon_a, tT_abij, tV_abij, tV_iabj,
                    tV_ijab, t_V_aijb=tV_aijb)


@jax.jit
def getEnergy(tT_abij, tV_ijab):
    e_dir = 2.0 * jnp.einsum("abij,ijab->", tT_abij, tV_ijab)
    return [e_dir, 0.0]
