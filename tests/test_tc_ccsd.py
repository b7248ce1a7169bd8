"""Transcorrelated pipeline golden tests: FCIDUMP(.tc) + TCDUMP → 3-body
contraction corrections → CCSD.

Oracles from ``pymes/test/test_tc_ccsd/test_tc_ccsd.py:17,39,66-67``.
"""

import os

import numpy as np


from pymes_tpu.integral import contraction
from pymes_tpu.mean_field import hf
from pymes_tpu.solver import ccsd
from pymes_tpu.util import fcidump, tcdump

DATA = os.path.join(os.path.dirname(__file__), "data")


def _tc_hf(fcidump_file, tcdump_file):
    n_elec, nb, e_core, e_orb, h_pq, V_pqrs = fcidump.read(
        os.path.join(DATA, fcidump_file), is_tc=True)
    no = n_elec // 2
    t_L = tcdump.read(os.path.join(DATA, tcdump_file))
    t_T_0 = contraction.get_triple_contraction(no, t_L)
    hf_e = float(hf.calc_hf_e(no, e_core, h_pq, V_pqrs)) + t_T_0
    return hf_e, (n_elec, no, h_pq, V_pqrs, t_L)


def _tc_ccsd(fcidump_file, tcdump_file):
    hf_e, (n_elec, no, h_pq, V_pqrs, t_L) = _tc_hf(fcidump_file, tcdump_file)
    fock = np.array(hf.construct_hf_matrix(no, h_pq, V_pqrs))
    fock += np.asarray(contraction.get_double_contraction(no, t_L))
    V = V_pqrs + np.asarray(contraction.get_single_contraction(no, t_L))
    mycc = ccsd.CCSD(no)
    return hf_e, mycc.solve(fock, V, delta_e=1e-11)["ccsd e"]


# Oracle provenance: the reference's own TC test (marked deprecated in-file,
# ``test_tc_ccsd.py:14-16``) FAILS on the reference snapshot — its hard-coded
# energies (−8.042996662464 / −0.010391224684 for LiH) predate the code.  The
# values asserted here were produced by running the *reference snapshot code*
# on the same data files (LiH deviates from the stale oracle by ~1e-3; H2's
# HF matches to 1e-8 and CCSD to 5e-6).


def test_tc_lih():
    hf_e, ccsd_e = _tc_ccsd("FCIDUMP.LiH.tc", "TCDUMP.LiH_FNO")
    assert abs(hf_e - (-8.044059106879612)) < 1e-8
    assert abs(ccsd_e - (-0.010563160683828635)) < 1e-7


def test_tc_h2():
    hf_e, ccsd_e = _tc_ccsd("FCIDUMP.H2.tc", "TCDUMP.H2.tc")
    assert abs(hf_e - (-1.166009516046628)) < 1e-8
    assert abs(ccsd_e - (-0.005914233662984753)) < 1e-7


def test_single_contraction_particle_exchange_symmetry():
    """The effective 2-body integrals must have <pq|rs> = <qp|sr> symmetry
    (property test from ``test_abinitio_3b_contraction.py:29-35``)."""
    t_L = tcdump.read(os.path.join(DATA, "TCDUMP.LiH_FNO"))
    D = np.asarray(contraction.get_single_contraction(2, t_L))
    assert np.abs(D - D.transpose(1, 0, 3, 2)).sum() < 1e-8


def test_double_contraction_values():
    """Pin the double-contraction output on LiH_FNO (reference-identical;
    note this dump's S_pq is *not* symmetric — asym ≈ 0.016 — also in the
    reference code, so the reference's symmetry property-test only applies
    to its original ab-initio TCDUMP which is absent from the snapshot)."""
    t_L = tcdump.read(os.path.join(DATA, "TCDUMP.LiH_FNO"))
    S = np.asarray(contraction.get_double_contraction(2, t_L))
    assert abs(float(np.trace(S)) - 0.0029937289444666934) < 1e-12
    assert abs(float(np.linalg.norm(S)) - 0.03271629359709914) < 1e-12
