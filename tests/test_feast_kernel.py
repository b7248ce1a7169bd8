"""Generic FEAST kernel + peripherals tests (kpoints, structure factor,
structure, cc4s round-trip)."""

import os

import numpy as np
import pytest

from pymes_tpu.solver import feast_kernel

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_feast_kernel_dense():
    """The generic kernel must isolate window eigenvalues of a random
    non-symmetric matrix through the matrix-free GCROT path."""
    rng = np.random.default_rng(3)
    dim = 20
    ham = np.diag(np.arange(dim) * 0.3)
    ham += rng.random((dim, dim)) - 0.5
    ham = (ham + ham.T) / 2
    t = np.eye(dim) + rng.random((dim, dim)) * 0.01
    ham = np.linalg.inv(t) @ ham @ t
    e_all = np.sort(np.linalg.eigvals(ham).real)

    e_c, e_r = 3.15, 0.25
    in_window = e_all[(e_all > e_c - e_r) & (e_all < e_c + e_r)]
    assert len(in_window) == 1

    eigvals, u = feast_kernel.feast(
        lambda x: ham @ x, np.diag(ham), nroots=2, e_c=e_c, e_r=e_r,
        max_cycle=50, conv_tol=1e-12, seed=4, verbose=False)
    assert np.min(np.abs(eigvals.real - in_window[0])) < 1e-8
    # returned eigenvector solves the eigenproblem
    if len(u):
        v = u[0] / np.linalg.norm(u[0])
        lam = v @ ham @ v
        assert np.linalg.norm(ham @ v - lam * v) < 1e-5


def test_feast_kernel_window_from_bounds():
    rng = np.random.default_rng(5)
    dim = 12
    ham = np.diag(np.linspace(0, 5.5, dim)) + 0.01 * rng.random((dim, dim))
    e_all = np.sort(np.linalg.eigvals(ham).real)
    emin, emax = 1.8, 2.8
    in_window = e_all[(e_all > emin) & (e_all < emax)]
    eigvals, u = feast_kernel.feast(
        lambda x: ham @ x, np.diag(ham), nroots=len(in_window) + 1,
        emin=emin, emax=emax, max_cycle=60, conv_tol=1e-12, seed=0,
        verbose=False)
    got = np.sort(eigvals.real[(eigvals.real > emin) & (eigvals.real < emax)])
    assert len(got) >= len(in_window)
    for e in in_window:
        assert np.min(np.abs(got - e)) < 1e-7


def test_rt_step_dense():
    import scipy.linalg
    dim = 10
    ham = np.diag(np.linspace(0.0, 2.0, dim))
    rng = np.random.default_rng(2)
    u0 = rng.random(dim) - 0.5
    u0 /= np.linalg.norm(u0)
    dt = 0.1
    got = feast_kernel.rt_step(lambda x: ham @ x, np.diag(ham), u0, dt=dt,
                               e_c=1.0, e_r=1.5, ngl_pts=64,
                               ls_conv_tol=1e-12)
    want = scipy.linalg.expm(1j * ham * dt) @ u0
    got /= np.linalg.norm(got)
    want /= np.linalg.norm(want)
    phase = np.vdot(got, want)
    phase /= abs(phase)
    assert np.linalg.norm(got * phase - want) < 1e-7


def test_feast_kernel_over_native_sigma():
    """The generic FEAST kernel driven by the native jitted EOM-CCSD sigma
    matvec must find the same window root as Davidson — the production
    molecular path (reference: pyscf-bound) exercised against our own
    backend."""
    import jax.numpy as jnp

    from pymes_tpu.integral.partition import part_2_body_int
    from pymes_tpu.mean_field import hf
    from pymes_tpu.solver import ccsd, eom_ccsd
    from pymes_tpu.solver.eom_ccsd import (get_diag_doubles,
                                           get_diag_singles,
                                           sigma_doubles, sigma_singles)
    from pymes_tpu.util import fcidump

    n_elec, nb, e_core, e_orb, h_pq, V_pqrs = fcidump.read(
        os.path.join(DATA, "FCIDUMP.H2.sto6g"))
    no = n_elec // 2
    fock = hf.construct_hf_matrix(no, h_pq, V_pqrs)
    mycc = ccsd.CCSD(no)
    res = mycc.solve(fock, V_pqrs, delta_e=1e-12, max_iter=100)
    dict_t_V = part_2_body_int(no, V_pqrs)
    fd = mycc.get_T1_dressed_fock(fock, res["t1"], dict_t_V)
    Vd = mycc.get_T1_dressed_V(res["t1"], dict_t_V)
    T2 = res["t2"]
    nv = T2.shape[0]
    n1 = nv * no

    e_dav = eom_ccsd.EOM_CCSD(no, n_excit=1).solve(fd, Vd, T2)[0]

    def matvec(x):
        u1 = jnp.asarray(x[:n1].reshape(nv, no))
        u2 = jnp.asarray(x[n1:].reshape(nv, nv, no, no))
        w1 = sigma_singles(fd, Vd, u1, u2, T2)
        w2 = sigma_doubles(fd, Vd, u1, u2, T2)
        return np.concatenate([np.asarray(w1).ravel(),
                               np.asarray(w2).ravel()])

    diag = np.concatenate([
        np.asarray(get_diag_singles(fd, Vd, T2)).ravel(),
        np.asarray(get_diag_doubles(fd, Vd, T2)).ravel()])

    eigvals, u = feast_kernel.feast(
        matvec, diag, nroots=2, e_c=float(e_dav), e_r=0.2, max_cycle=40,
        conv_tol=1e-10, ls_max_iter=100, seed=3, verbose=False)
    assert np.min(np.abs(eigvals.real - e_dav)) < 1e-6


def test_pyscf_adapter_gated():
    from pymes_tpu.solver import feast_eom_rccsd
    with pytest.raises(ImportError):
        feast_eom_rccsd.FEAST_EOMEESinglet(None)


def test_kpoints_cubic_ir_mesh():
    from pymes_tpu.util.kpoints import gen_ir_ks
    for n in (2, 3, 4):
        frac, weight = gen_ir_ks(n)
        assert np.isclose(weight.sum(), 1.0)
        # known irreducible counts for unshifted simple-cubic meshes
        expected = {2: 4, 3: 4, 4: 10}[n]
        assert len(frac) == expected


def test_structure_poscar_roundtrip(tmp_path):
    from pymes_tpu.util.structure import Structure
    poscar = tmp_path / "POSCAR"
    poscar.write_text(
        "test cell\n1.5\n"
        "1.0 0.0 0.0\n0.0 1.0 0.0\n0.0 0.0 1.0\n"
        "2\nD\n"
        "0.0 0.0 0.0\n0.5 0.5 0.5\n")
    s = Structure(str(poscar))
    assert s.numAtom == 2
    assert s.latticeConstant == 1.5
    nn = s.findNNTable()
    # bcc-like: nearest image distance = sqrt(3)/2 * a * latticeConstant
    assert np.isclose(nn[0, 1], np.sqrt(3) / 2 * 1.5)

    os.chdir(tmp_path)
    s.write2File(str(tmp_path / "POSCAR.out"))
    s2 = Structure(str(tmp_path / "POSCAR.out"))
    assert np.allclose(s2.posAtom, s.posAtom)
    assert np.allclose(s2.cellVecs, s.cellVecs)


def test_structure_optimizer(tmp_path):
    from pymes_tpu.util.structure import Optimizer, Structure
    poscar = tmp_path / "POSCAR"
    poscar.write_text(
        "cell\n1.0\n"
        "1.0 0.0 0.0\n0.0 1.0 0.0\n0.0 0.0 1.0\n"
        "2\nC\n"
        "0.0 0.0 0.0\n0.6 0.0 0.0\n")
    s = Structure(str(poscar))
    opt = Optimizer(s, timestep=0.1, threshhold=1e-3)
    forces = tmp_path / "forces.dat"
    forces.write_text("0.1 0 0\n-0.1 0 0\n")
    os.chdir(tmp_path)
    converged = opt.run_step(hf_file=str(forces))
    assert not converged
    # atoms moved toward each other by dt*F (net-force projection keeps
    # the center of mass fixed)
    assert np.isclose(s.posAtom[0, 0], 0.01)
    assert np.isclose(s.posAtom[1, 0], 0.59)


def test_cc4s_roundtrip(tmp_path):
    from pymes_tpu.util import cc4s_interface
    os.chdir(tmp_path)
    t = np.arange(24, dtype=float).reshape(2, 3, 4)
    cc4s_interface.write_2_cc4s_tensor(t, [2, 3, 4], "T_test")
    name, dims, data = cc4s_interface.read_cc4s_tensor("T_test.dat")
    assert dims == [2, 3, 4]
    assert np.allclose(data.reshape(2, 3, 4), t)


def test_structure_factor_ueg():
    from pymes_tpu.mean_field import hf
    from pymes_tpu.models import ueg
    from pymes_tpu.solver import mp2
    from pymes_tpu.util import structure_factor

    u = ueg.UEG(14, 7, 7, 1.0)
    u.init_single_basis(2)
    V = u.eval_2b_integrals()
    no = 7
    kin = u.kinetic_energies()
    eps_i = hf.calcOccupiedOrbE(kin, V[:no, :no, :no, :no], no)
    eps_a = hf.calcVirtualOrbE(kin, V[no:, :no, no:, :no],
                               V[no:, :no, :no, no:], no, u.n_spatial - no)
    _, T2 = mp2.solve(eps_i, eps_a, V[:no, :no, no:, no:],
                      V[no:, no:, :no, :no])

    q, S = structure_factor.calcReciprocalSpaceStructureFactor(u, T2)
    assert len(q) > 1 and np.all(np.isfinite(S))
    # correlation S(q) must vanish at q=0 relative to the large-q tail? not
    # generally — just check the realspace transform is finite & decaying
    r = np.linspace(0.1, 5.0, 20)
    g = structure_factor.calcRealSpaceStructureFactor(r, u, T2)
    assert np.all(np.isfinite(g))
