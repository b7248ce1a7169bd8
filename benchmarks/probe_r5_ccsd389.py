"""Round-5 probe: mf-CCSD at nP=389 (VERDICT r4 task 7 — one scale row
above nP=219 for CCSD; ground-state CCD reached 389 at 209 ms/iter in
round 2, CCSD has no recorded number past 219).

Fixed-iteration methodology (delta_e=-1 runs the while_loop to the cap),
min over 3 solves; oracle: the Γ-point mf-CCSD energy must equal the
mf-CCD energy (T1 ≡ 0 by momentum conservation).

Run: python -u benchmarks/probe_r5_ccsd389.py > /tmp/probe_r5_ccsd389.out 2>&1
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

from _setup import build_ueg_mf
from pymes_tpu.solver import ccsd
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

CUT = int(os.environ.get("R5_CUT", 20))     # 20 -> nP=389
t_all = time.time()
s = build_ueg_mf(CUT, contract_mode="ozaki:7:6", max_iter=60)
no, fock, Vd, T2 = s["no"], s["fock"], s["Vd"], s["T2"]
dmf = {k: s["d"][k] for k in ('klij', 'ijab', 'abij', 'iajb', 'iabj',
                              'aibj', 'aijb', 'ijka', 'ijak', 'iajk')}
dmf['_ovvv_plans'] = Vd['_ovvv_plans']
lad = s["bp_all"]
print(f"setup_s={s['setup_s']:.1f} ccd_s={s['ccd_s']:.1f} "
      f"e_ccd={s['e_ccd']:.10f}", flush=True)

for mode in ("ozaki:7:6", "ozaki:5:4"):
    cc = ccsd.CCSD(no)
    t0 = time.time()
    res = cc.solve(fock, dmf, level_shift=-1.0, max_iter=12,
                   delta_e=1e-8, ladder=lad, contract_mode=mode)
    cold = time.time() - t0
    e = res["ccsd e"]
    t1max = float(np.abs(np.asarray(res["t1"])).max())
    walls, n_it = [], 0
    for _ in range(3):
        t0 = time.time()
        r2 = cc.solve(fock, dmf, level_shift=-1.0, max_iter=12,
                      delta_e=-1.0, ladder=lad, contract_mode=mode)
        walls.append(time.time() - t0)
        n_it = len(r2["e history"])
    per = min(walls) / max(n_it, 1) * 1e3
    print(f"mf-CCSD nP={s['n_p']} [{mode}]: e={e:.10f} "
          f"|e-e_ccd|={abs(e - s['e_ccd']):.2e} |T1|max={t1max:.1e} "
          f"cold={cold:.1f}s fixed-{n_it}-iter "
          f"walls={['%.2f' % w for w in walls]}s -> {per:.1f} ms/iter",
          flush=True)
print(f"PROBE R5 CCSD389 DONE total={time.time()-t_all:.0f}s", flush=True)
