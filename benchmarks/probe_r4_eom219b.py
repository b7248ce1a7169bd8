"""Round-4 probe B: isolate the nP=219 EOM negative-root behavior.

probe_r4_eom219 found the (default) mixed-precision Davidson at nP=219
hitting max_iter=300 on a near-degenerate pair at ~-0.59/-0.57 — far
below the minimum diagonal gap 5.179 — while r3's f64 path at nP=123
converged to 5.2403/5.2760 in 27 iterations.  The no-ovvv sigma is
verified against dense ovvv blocks at nP=219 (3e-14, /tmp/diag_sigma219)
and the all-bra ladder against dense V_abcd, so this separates:

  1. nP=123 mixed vs f64: does the dtype-aware threshold fix restore
     the r3 golden roots through the mixed path?
  2. nP=219 f64-only: is the negative basin an artifact of the f32
     phase, or where the f64 Davidson itself goes at this size?

Run: python -u benchmarks/probe_r4_eom219b.py > /tmp/probe_r4_eom219b.out 2>&1
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
from pymes_tpu.solver.eom_ccsd import EOM_CCSD
from pymes_tpu.ops.ueg_ladder import build_block_ladder, build_ovvv_plans
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj', 'aijb',
        'ijka', 'ijak', 'iajk')


def build(cutoff):
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
    bp_all = build_block_ladder(u, bra="all")
    blocks = ccd.CCDBlocks(klij=d['klij'], ijab=d['ijab'], abij=d['abij'],
                           iajb=d['iajb'], iabj=d['iabj'], abcd=None,
                           ladder=bp_all)
    res = ccd.CCD(no).solve(fock, blocks, level_shift=-1.0, max_iter=60,
                            contract_mode="ozaki:7:6")
    T2 = jnp.asarray(res["t2 amp"])
    print(f"cutoff={cutoff} nP={n_p}: CCD e={res['ccd e']:.10f}",
          flush=True)
    Vd = {k: d[k] for k in ('klij', 'ijab', 'abij', 'iajb', 'iabj',
                            'ijka', 'ijak', 'iajk')}
    Vd["abcd"] = None
    Vd["abcd_ladder"] = bp_all
    Vd["_ovvv_plans"] = build_ovvv_plans(u)
    return no, fock, Vd, T2


def run_eom(tag, no, fock, Vd, T2, precision, max_iter=300):
    dav = EOM_CCSD(no, n_excit=2)
    dav.max_iter = max_iter
    dav.contract_mode = "ozaki:7:6"
    dav.precision = precision
    t0 = time.time()
    ev = np.sort(np.real(dav.solve(fock, Vd, T2)))
    print(f"EOM[{tag}|{precision}]: roots={ev} wall={time.time()-t0:.1f}s "
          f"iters={dav.n_iterations}", flush=True)
    return ev


# nP=123 oracle history (2026-08-19).  The r3 "golden" pair
# [5.24025232, 5.27604094] turned out to MISS a degenerate partner:
# the true spectrum is a near-degenerate pair 5.2402523{2,4} (split
# ~2e-8; the UEG first shell gap is 6-fold degenerate at 5.179) with
# 5.27604094 as root THREE — confirmed by an untracked f64 n_excit=3
# run (/tmp/debug_mom3.out: [5.24025234 5.24025234 5.27604094], 28
# iters).  Recorded failure ladder that led here: UNtracked mixed dove
# to a spurious basin at −0.598 (300 iters); untracked f64 at nP=219
# dove to −0.44 — selection-driven, not precision-driven.
# FIXED-guess-coordinate overlap tracking locked root 2 onto the most
# guess-dominated state (6.073).  Summed-mass MOM collapsed both roots
# onto one state.  The shipped fix is MOM with GREEDY ONE-TO-ONE
# MATCHING against the previous iterate's Ritz vectors, seeded by the
# guesses — adiabatic, duplicate-free; this probe validates it through
# the default mixed pipeline, whose correct n_excit=2 answer is the
# degenerate pair.
GOLD = np.array([5.24025233, 5.24025233])  # pair center, tol 1e-6
no, fock, Vd, T2 = build(10)
r_mix = run_eom("nP=123", no, fock, Vd, T2, "mixed")
print(f"nP=123 |tracked-mixed - degenerate-pair oracle| = "
      f"{np.max(np.abs(r_mix - GOLD)):.3e} (pass < 1e-6)", flush=True)
print("PROBE R4 EOM219B DONE", flush=True)
