"""Round-5 probe: re-time the nP=57 FEAST window on the shipped
mixed-precision engine (VERDICT r4 task 5) + the mixed-vs-f64
equivalence number (task 1c).

The only FEAST timing on record is r3's 416 s warm (probe_q_feast_ozaki:
inhouse+ozaki all-f64, n_quad=8, n_trial=4, ls_conv_tol=1e-5,
ls_max_iter=40 — solver work ~4x production settings), which predates
the entire r4 engine (f32 Krylov in one lax.map-over-nodes program +
f64 iterative refinement).  Re-run the SAME window and settings with
ls_precision="mixed" (the default) and "f64", recording walls and
|ev_mixed - ev_f64| (bar: <= 1e-8).

Run: python -u benchmarks/probe_r5_feast57.py > /tmp/probe_r5_feast57.out 2>&1
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

from _setup import build_ueg_mf
from pymes_tpu.solver.eom_ccsd import EOM_CCSD
from pymes_tpu.solver.feast_eom_ccsd import FEAST_EOM_CCSD
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

t_all = time.time()
s57 = build_ueg_mf(5, contract_mode="ozaki:7:6")
no, fock, Vd, T2 = s57["no"], s57["fock"], s57["Vd"], s57["T2"]

dav = EOM_CCSD(no, n_excit=2)
dav.max_iter = 300
dav.contract_mode = "ozaki:7:6"
t0 = time.time()
roots = np.sort(np.real(dav.solve(fock, Vd, T2)))
print(f"Davidson nP=57: roots={roots} wall={time.time()-t0:.1f}s "
      f"iters={dav.n_iterations}", flush=True)
e_c = float(roots.mean())
e_r = float(np.ptp(roots) / 2 + 0.05)

evs, warms = {}, {}
for prec in ("mixed", "f64"):
    s = FEAST_EOM_CCSD(no, e_c=e_c, e_r=e_r, n_trial=4, max_iter=4,
                       n_quad=8, seed=11, n_excit=2, ls_conv_tol=1e-5)
    s.ls_precision = prec
    s.ls_backend = "inhouse"
    s.contract_mode = "ozaki:7:6"
    # first r5 run kept r3's ls_max_iter=40 with the DEFAULT restart 20:
    # the mixed legs' near-axis nodes stalled at rel residuals 0.6-3.9
    # (the starved-solve warning fired, ev junk) — the same stagnation
    # probe_r4_feast3 closed at nP=123 with GMRES(120) — and the f64
    # leg's 4-node vmapped inhouse program crashed the axon worker
    # (compile watchdog class: the 2-node program took 450 s to compile,
    # probe_q_compile; 4-node blows past the ~11 min kill).
    if prec == "mixed":
        s.ls_restart = 120
        s.ls_max_iter = 4
    else:
        s.max_nodes_per_dispatch = 2   # compile-watchdog-safe program
        s.ls_restart = 60
        s.ls_max_iter = 8
    for run in ("cold", "warm"):
        t0 = time.time()
        ev = np.sort(np.real(s.solve(fock, Vd, T2)))
        wall = time.time() - t0
        print(f"FEAST[{prec}|{run}] nP=57 (r3-416s settings): "
              f"wall={wall:.1f}s ev={ev} "
              f"max_ls_res={np.max(s.last_ls_residuals):.2e}", flush=True)
    warms[prec] = wall
    evs[prec] = ev[(ev > e_c - e_r) & (ev < e_c + e_r)]

k = min(len(evs["mixed"]), len(evs["f64"]))
dev = np.max(np.abs(evs["mixed"][:k] - evs["f64"][:k])) if k else np.inf
dav_dev = (np.max(np.abs(np.sort(evs["mixed"])[:2] - roots[:2]))
           if len(evs["mixed"]) >= 2 else np.inf)
print(f"FEAST nP=57: |mixed - f64| = {dev:.3e} (bar 1e-8), "
      f"|mixed - davidson| = {dav_dev:.3e}, warm mixed {warms['mixed']:.1f}s "
      f"vs f64 {warms['f64']:.1f}s vs r3-recorded 416 s", flush=True)
print(f"PROBE R5 FEAST57 DONE total={time.time()-t_all:.0f}s", flush=True)
