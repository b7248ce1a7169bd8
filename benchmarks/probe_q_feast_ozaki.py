"""Probe Q: FEAST + RT shifted solves with the ozaki sigma INSIDE the
GMRES (VERDICT r2 task 1).

The in-house device GMRES (ops/gmres.py) only calls the matvec, so the
integer-MXU contraction backend and plan-attached int8 ladder slices run
inside the shifted solves.  Round 2 shelved this after axon-worker
crashes at scale; this probe ramps nP=57 -> 123 and cross-checks the
inhouse+ozaki eigenvalues/propagator against the jsp+xla path.

Run: python -u benchmarks/probe_q_feast_ozaki.py > /tmp/probe_q.out 2>&1
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import pymes_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from pymes_tpu.models import ueg
from pymes_tpu.mean_field import hf
from pymes_tpu.solver import ccd
from pymes_tpu.solver.feast_eom_ccsd import FEAST_EOM_CCSD
from pymes_tpu.solver.rt_eom_ccsd import RT_EOM_CCSD
from pymes_tpu.ops.ueg_ladder import build_block_ladder
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj', 'aijb',
        'ijka', 'ijak', 'iajk', 'iabc', 'abic')

for cutoff in sorted({int(os.environ.get("Q_CUT0", 5)),
                      int(os.environ.get("Q_CUT1", 10))}):
    u = ueg.UEG(14, 7, 7, 0.5)
    u.init_single_basis(cutoff)
    no, n_p = 7, u.n_spatial
    nv = n_p - no
    idx, vals = u.eval_2b_integrals(sp=2)
    d = ueg.sparse_to_blocks(idx, vals, n_p, no, names=NEED,
                             dtype=jnp.float64)
    kin = jnp.asarray(u.kinetic_energies())
    eps_i = hf.calcOccupiedOrbE(kin, d['klij'], no)
    eps_a = hf.calcVirtualOrbE(kin, d['aibj'], d['aijb'], no, nv)
    fock = jnp.diag(jnp.concatenate([eps_i, eps_a]))
    bp = build_block_ladder(u)          # presliced int8 sectors attached
    blocks = ccd.CCDBlocks(klij=d['klij'], ijab=d['ijab'], abij=d['abij'],
                           iajb=d['iajb'], iabj=d['iabj'], abcd=None,
                           ladder=bp)
    res = ccd.CCD(no).solve(fock, blocks, level_shift=-1.0, max_iter=60)
    T2 = jnp.asarray(res["t2 amp"])
    print(f"cutoff={cutoff} nP={n_p}: CCD e={res['ccd e']:.10f}",
          flush=True)

    Vd = {k: d[k] for k in ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'ijka',
                            'ijak', 'iajk', 'iabc', 'abic')}
    Vd["abcd"] = None
    Vd["abcd_ladder"] = bp

    # window centred on REAL EOM roots (a windowed solve on an empty
    # window returns basin-dependent junk — the round-3 first probe cut)
    from pymes_tpu.solver.eom_ccsd import EOM_CCSD
    dav = EOM_CCSD(no, n_excit=2)
    dav.max_iter = 300
    dav.contract_mode = "ozaki:7:6"
    t0 = time.time()
    roots = np.sort(np.real(dav.solve(fock, Vd, T2)))
    print(f"Davidson cutoff={cutoff}: roots={roots} "
          f"wall={time.time()-t0:.1f}s iters={dav.n_iterations}",
          flush=True)
    e_c = float(roots.mean())
    e_r = float(np.ptp(roots) / 2 + 0.05)
    outs = {}
    for tag, backend, mode in (("inhouse+ozaki", "inhouse", "ozaki:7:6"),
                               ("jsp+xla", "jsp", "xla")):
        s = FEAST_EOM_CCSD(no, e_c=e_c, e_r=e_r, n_trial=4, max_iter=4,
                           n_quad=8, seed=11, n_excit=2, ls_conv_tol=1e-5)
        s.ls_backend = backend
        s.contract_mode = mode
        s.ls_max_iter = 40
        for run in ("cold", "warm"):
            t0 = time.time()
            ev = np.sort(np.real(s.solve(fock, Vd, T2)))
            dtw = time.time() - t0
            print(f"FEAST[{tag}|{run}] cutoff={cutoff}: wall={dtw:.1f}s "
                  f"ev={ev} max_ls_res={np.max(s.last_ls_residuals):.2e}",
                  flush=True)
        # the window roots (those inside [e_c - e_r, e_c + e_r])
        inside = ev[(ev > e_c - e_r) & (ev < e_c + e_r)]
        outs[tag] = inside
    k = min(len(outs["inhouse+ozaki"]), len(outs["jsp+xla"]))
    dev = np.max(np.abs(outs["inhouse+ozaki"][:k] - outs["jsp+xla"][:k]))
    dev_dav = np.max(np.abs(outs["inhouse+ozaki"][:2] - roots[:2])) \
        if len(outs["inhouse+ozaki"]) >= 2 else np.inf
    print(f"FEAST cutoff={cutoff}: |inhouse+ozaki - jsp+xla| = {dev:.3e}, "
          f"|inhouse - davidson| = {dev_dav:.3e}", flush=True)

    # RT: one step, both paths
    rng = np.random.default_rng(4)
    u1 = rng.standard_normal((nv, no))
    u2 = rng.standard_normal((nv, nv, no, no)) * 0.01
    outs = {}
    for tag, backend, mode in (("inhouse+ozaki", "inhouse", "ozaki:7:6"),
                               ("jsp+xla", "jsp", "xla")):
        r = RT_EOM_CCSD(no, e_c=float(roots.mean()), e_r=1.0, n_quad=16)
        r.ls_backend = backend
        r.contract_mode = mode
        r.ls_max_iter = 40
        r.ls_conv_tol = 1e-6
        for run in ("cold", "warm"):
            t0 = time.time()
            q1, q2 = r.solve(fock, Vd, T2, dt=0.05, u_singles=u1,
                             u_doubles=u2)
            print(f"RT[{tag}|{run}] cutoff={cutoff}: "
                  f"wall={time.time()-t0:.1f}s "
                  f"max_ls_res={np.max(r.last_ls_residuals):.2e}",
                  flush=True)
        outs[tag] = (np.asarray(q1), np.asarray(q2))
    # global phase fixed by normalize_amps? compare |overlap| instead
    a = np.concatenate([outs["inhouse+ozaki"][0].ravel(),
                        outs["inhouse+ozaki"][1].ravel()])
    b = np.concatenate([outs["jsp+xla"][0].ravel(),
                        outs["jsp+xla"][1].ravel()])
    ov = abs(np.vdot(a, b)) / (np.linalg.norm(a) * np.linalg.norm(b))
    print(f"RT cutoff={cutoff}: |<inhouse|jsp>| = {ov:.12f} "
          f"(1 - ov = {1-ov:.3e})", flush=True)
print("PROBE Q DONE", flush=True)
