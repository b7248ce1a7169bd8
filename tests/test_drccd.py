"""drCCD = dRPA identity test.

The drCCD amplitudes must solve the dRPA Riccati equation and the
correlation energy must equal the plasmon formula
``E_c = ½(Σ ω_RPA − tr A)`` — a far stronger oracle than the reference's
drCCD test (which has no assertion at all; and the reference's drCCD
residual/energy wiring does not satisfy this identity, see
``pymes_tpu/solver/ccd.py``/``drccd.py`` notes).
"""

import numpy as np
from scipy.linalg import eigvalsh, sqrtm

from pymes_tpu.mean_field import hf
from pymes_tpu.models import ueg
from pymes_tpu.solver import ccd


def _rpa_matrices(V, eps_i, eps_a, no, nv):
    A = np.zeros((nv * no, nv * no))
    B = np.zeros((nv * no, nv * no))
    aijb = V[no:, :no, :no, no:]
    abij = V[no:, no:, :no, :no]
    de = (eps_a[:, None] - eps_i[None, :]).ravel()
    A = 2.0 * aijb.transpose(0, 2, 3, 1).reshape(nv * no, nv * no)
    A[np.arange(nv * no), np.arange(nv * no)] += de
    B = 2.0 * abij.transpose(0, 2, 1, 3).reshape(nv * no, nv * no)
    return A, B


def test_drccd_equals_drpa_plasmon():
    nel, rs, cutoff = 14, 1.0, 2
    no = nel // 2
    u = ueg.UEG(nel, no, no, rs)
    u.init_single_basis(cutoff)
    V = u.eval_2b_integrals()
    kin = u.kinetic_energies()
    eps_i = np.asarray(hf.calcOccupiedOrbE(kin, V[:no, :no, :no, :no], no))
    nv = u.n_spatial - no
    eps_a = np.asarray(hf.calcVirtualOrbE(kin, V[no:, :no, no:, :no],
                                          V[no:, :no, :no, no:], no, nv))

    A, B = _rpa_matrices(V, eps_i, eps_a, no, nv)
    S = sqrtm(A - B)
    omega = np.sqrt(np.abs(eigvalsh(S @ (A + B) @ S)))
    e_plasmon = 0.5 * (omega.sum() - np.trace(A))

    fock = hf.construct_hf_matrix(no, np.diag(kin), V)
    solver = ccd.CCD(no, is_dr_ccd=True, is_diis=True)
    res = solver.solve(fock, V, level_shift=-0.5, max_iter=200,
                       delta_e=1e-10)
    assert abs(res["ccd e"] - e_plasmon) < 1e-7

    # amplitudes solve the Riccati equation: B + A(2T) + (2T)A + (2T)B(2T)=0
    Tm = 2.0 * np.asarray(res["t2 amp"]).transpose(0, 2, 1, 3).reshape(
        nv * no, nv * no)
    resid = B + A @ Tm + Tm @ A + Tm @ B @ Tm
    assert np.linalg.norm(resid) < 1e-6
