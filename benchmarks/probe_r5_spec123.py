"""Round-5 probe: the TRUE lowest spectrum at nP=123.

The nP=57 f64 cross-check (2026-08-21) exposed that the UEG excitation
levels carry shell-structure degeneracies the n_excit=6/7 sweeps
undercounted: lowest-10 at nP=57 is 5.2429519 x3, 5.2652816 x3,
5.2789029 x4 — not pairs.  The nP=123 FEAST GOLD list (5.24025234 x2,
5.26162341 x2 inside, 5.27604094 x3 outside) came from the same kind of
sweep and its multiplicities are therefore suspect; every "starvation"
narrative depends on the window's true content.  This probe runs the
production Davidson (mixed pipeline, f64 polish, MOM tracking) with
n_excit=14 and writes the roots for the follow-up FEAST run to consume.

Run: python -u benchmarks/probe_r5_spec123.py > /tmp/probe_r5_spec123.out 2>&1
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

from _setup import build_ueg_mf
from pymes_tpu.solver.eom_ccsd import EOM_CCSD
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

t_all = time.time()
s = build_ueg_mf(10, contract_mode="ozaki:7:6", max_iter=60)
no, fock, Vd, T2 = s["no"], s["fock"], s["Vd"], s["T2"]
print(f"nP={s['n_p']} setup={time.time()-t_all:.0f}s", flush=True)

dav = EOM_CCSD(no, n_excit=int(os.environ.get("R5_NEX", 14)))
dav.max_iter = 300
dav.contract_mode = "ozaki:7:6"
t0 = time.time()
roots = np.sort(np.real(dav.solve(fock, Vd, T2)))
wall = time.time() - t0
print(f"nP=123 lowest-{dav.n_excit} Davidson roots: {repr(roots)} "
      f"iters={dav.n_iterations} wall={wall:.1f}s", flush=True)
np.save("/tmp/spec123_roots.npy", roots)
lv, mult = [], []
for r in roots:
    if lv and abs(r - lv[-1]) < 1e-5:
        mult[-1] += 1
    else:
        lv.append(r); mult.append(1)
print("levels:", [f"{v:.7f} x{m}" for v, m in zip(lv, mult)], flush=True)
print(f"PROBE R5 SPEC123 DONE total={time.time()-t_all:.0f}s", flush=True)
