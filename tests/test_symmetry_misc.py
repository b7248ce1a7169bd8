"""Tests: 48-fold L symmetry utilities, Brueckner CCD, blocked MP2,
TCDUMP round trip."""

import os

import numpy as np

from pymes_tpu.integral import symmetry
from pymes_tpu.util import tcdump

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_sym_images_count():
    axes = symmetry.sym_images_axes()
    assert len(axes) == 48
    assert len(set(axes)) == 48
    strs = symmetry.gen_sym_str_inds("orpsqt")
    assert len(strs) == 48 and "orpsqt" in strs


def test_index_codecs():
    from pymes_tpu.integral.symmetry import (global_ind_2_list_inds,
                                             list_inds_2_global_ind)
    shape = (3, 4, 5, 6)
    for g in (0, 17, 359):
        li = global_ind_2_list_inds(g, shape)
        assert list_inds_2_global_ind(li, shape) == g


def test_unique_triangle_roundtrip():
    """Compress a 6-fold-symmetric L to unique entries and recover it."""
    t_L = tcdump.read(os.path.join(DATA, "TCDUMP.H2.tc"))
    idx, vals = symmetry.unique_triangle(t_L)
    assert len(vals) < np.count_nonzero(t_L)  # actual compression
    back = symmetry.recover_L(idx, vals, t_L.shape[0])
    assert np.abs(back - t_L).max() < 1e-14


def test_symmetrize_idempotent():
    rng = np.random.default_rng(0)
    t = rng.standard_normal((3,) * 6)
    s = symmetry.symmetrize(t)
    assert symmetry.symmetry_defect(s) < 1e-13
    assert np.abs(symmetry.symmetrize(s) - s).max() < 1e-14


def test_tcdump_write_read_roundtrip(tmp_path):
    # LiH_FNO exercises orbits where the reference writer's triangle
    # filter (o<=p<=q AND pair-index ordering) is unsatisfiable for every
    # permutation — its round trip drops 87/532 entries; the canonical-
    # representative writer here must be lossless on both dumps
    for dump in ("TCDUMP.H2.tc", "TCDUMP.LiH_FNO"):
        t_L = tcdump.read(os.path.join(DATA, dump))
        out = tmp_path / ("out_" + dump)
        tcdump.write(t_L, str(out))
        t_L2 = tcdump.read(str(out))
        assert np.abs(t_L - t_L2).max() < 1e-12, dump


def test_brueckner_ccd():
    """Brueckner CCD on LiH: converges, lands near plain CCD."""
    from pymes_tpu.mean_field import hf
    from pymes_tpu.solver import ccd
    from pymes_tpu.util import fcidump

    n_elec, nb, e_core, e_orb, h_pq, V_pqrs = fcidump.read(
        os.path.join(DATA, "FCIDUMP.LiH.321g"))
    no = n_elec // 2
    fock = hf.construct_hf_matrix(no, h_pq, V_pqrs)
    res = ccd.CCD(no, is_bruekner=True).solve(fock, V_pqrs, max_iter=100)
    assert abs(res["dE"]) < 1e-8
    # no reference oracle exists: the reference's Brueckner path diverges
    # (cumulative ε update, ccd.py:110-115 → hole energies ±10³ Ha on this
    # system); the corrected non-compounding scheme lands near plain CCD
    assert abs(res["ccd e"] - (-0.01830250126018896)) < 1e-3
    # quasi-particle energies moved away from the canonical ones
    assert not np.allclose(np.asarray(res["hole e"]),
                           np.asarray(fock).diagonal()[:no])


def test_mp2_blocked_matches_dense():
    from pymes_tpu.mean_field import hf
    from pymes_tpu.models import ueg
    from pymes_tpu.solver import mp2

    u = ueg.UEG(14, 7, 7, 1.0)
    u.init_single_basis(2)
    V = u.eval_2b_integrals()
    no = 7
    kin = u.kinetic_energies()
    eps_i = hf.calcOccupiedOrbE(kin, V[:no, :no, :no, :no], no)
    eps_a = hf.calcVirtualOrbE(kin, V[no:, :no, no:, :no],
                               V[no:, :no, :no, no:], no, u.n_spatial - no)
    e_dense, _ = mp2.solve(eps_i, eps_a, V[:no, :no, no:, no:],
                           V[no:, no:, :no, :no])
    e_blocked = mp2.solve_blocked(eps_i, eps_a, V[:no, :no, no:, no:],
                                  V[no:, no:, :no, :no], nv_part_size=5)
    assert abs(float(e_dense) - float(e_blocked)) < 1e-12


def test_ueg_sparse_matches_dense():
    from pymes_tpu.models import ueg

    u = ueg.UEG(14, 7, 7, 1.0)
    u.init_single_basis(2)
    V = u.eval_2b_integrals()
    idx, vals = u.eval_2b_integrals(sp=2)
    V2 = np.asarray(ueg.sparse_to_dense(idx, vals, u.n_spatial))
    assert np.abs(V - V2).max() < 1e-15
