"""Round-5 probe: a WELL-POSED nP=57 FEAST window, converged to the
Davidson oracle.

probe_r5_feast57 retimes the engine at r3's exact knobs (e_r=0.05,
n_trial=4, n_quad=8, ls tol 1e-5) — an ill-posed window: it spans at
least two degenerate pairs (5.2429519 x2 Davidson; a stable pair at
5.2789020 x2 shows up in the FEAST run itself), so 4 trials cannot
resolve the contents and the returned singles are noise.  Here the
window is sized to hold EXACTLY the lowest pair (e_r small enough to
exclude 5.2789), with n_quad=16 for edge contrast and ls tol 1e-8
against the near-axis noise-amplification floor (RESULTS round 5,
FEAST act II).

Run: python -u benchmarks/probe_r5_feast57b.py > /tmp/probe_r5_feast57b.out 2>&1
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

from _setup import build_ueg_mf
from pymes_tpu.solver.feast_eom_ccsd import FEAST_EOM_CCSD
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

GOLD = 5.2429519   # degenerate pair, probe_r5_feast57 Davidson (8 iters)

t_all = time.time()
s57 = build_ueg_mf(5, contract_mode="ozaki:7:6")
no, fock, Vd, T2 = s57["no"], s57["fock"], s57["Vd"], s57["T2"]
print(f"nP={s57['n_p']} setup={time.time()-t_all:.0f}s", flush=True)

s = FEAST_EOM_CCSD(no, e_c=GOLD, e_r=0.018, n_trial=4, max_iter=4,
                   n_quad=16, seed=11, n_excit=4,
                   ls_conv_tol=float(os.environ.get("R5_LS_TOL", 1e-8)),
                   tol=1e-10)
s.contract_mode = "ozaki:7:6"
s.ls_backend = "inhouse"
s.ls_restart = 120
s.ls_max_iter = 6
s.max_trials_per_batch = 1

for run in ("cold", "warm"):
    t0 = time.time()
    ev = np.sort(np.real(s.solve(fock, Vd, T2)))
    wall = time.time() - t0
    inside = ev[(ev > GOLD - 0.018) & (ev < GOLD + 0.018)]
    dev = (np.max(np.abs(inside - GOLD)) if len(inside) else np.inf)
    print(f"FEAST57B[{run}]: wall={wall:.1f}s ev={ev} inside={inside} "
          f"|ev-gold|={dev:.3e} max_ls_res={np.max(s.last_ls_residuals):.2e} "
          f"iter_walls={[round(x,1) for x in s.iter_walls]}", flush=True)
print(f"PROBE R5 FEAST57B DONE total={time.time()-t_all:.0f}s", flush=True)
