"""Hartree-Fock helpers (energy, Fock build, UEG orbital energies).

Functional parity with ``pymes/mean_field/hf.py:5,14,21,33``; expressed as
jitted jnp contractions so Fock builds fuse on device.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=0)
def calc_hf_e(no: int, e_core, t_h_pq, t_V_pqrs):
    """Closed-shell HF total energy: 2Σ_i h_ii + Σ_ij (2<ij|ij> − <ij|ji>) + E_core."""
    h_oo = t_h_pq[:no, :no]
    V_oooo = t_V_pqrs[:no, :no, :no, :no]
    e = 2.0 * jnp.einsum("ii->", h_oo)
    e += 2.0 * jnp.einsum("jiji->", V_oooo)
    e += -1.0 * jnp.einsum("ijji->", V_oooo)
    return e + e_core


@partial(jax.jit, static_argnums=0)
def construct_hf_matrix(no: int, t_h_pq, t_V_pqrs):
    """Fock matrix F_pq = h_pq + Σ_i (2<pi|qi> − <pi|iq>)."""
    f = t_h_pq
    f = f + 2.0 * jnp.einsum("piqi->pq", t_V_pqrs[:, :no, :, :no])
    f = f - 1.0 * jnp.einsum("piiq->pq", t_V_pqrs[:, :no, :no, :])
    return f


def calcOccupiedOrbE(kinetic_G, t_V_ijkl, no):
    """UEG occupied orbital energies: kinetic + Σ_j (2<ij|ij> − <ij|ji>)."""
    e = jnp.asarray(kinetic_G)[:no]
    e = e + 2.0 * jnp.einsum("ijij->i", t_V_ijkl)
    e = e - 1.0 * jnp.einsum("ijji->i", t_V_ijkl)
    return e


def calcVirtualOrbE(kinetic_G, t_V_aibj, t_V_aijb, no, nv):
    """UEG virtual orbital energies: kinetic + Σ_i (2<ai|ai> − <ai|ia>)."""
    e = jnp.asarray(kinetic_G)[no:]
    e = e + 2.0 * jnp.einsum("aiai->a", t_V_aibj)
    e = e - 1.0 * jnp.einsum("aiia->a", t_V_aijb)
    return e
