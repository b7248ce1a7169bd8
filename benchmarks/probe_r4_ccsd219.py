"""Round-4 probe: mf-CCSD nP=219 per-iteration wall after the
half-symmetric dressing fusion (VERDICT r3 task 4; target <= 60 ms/iter).

Fixed-iteration methodology (delta_e=-1 runs the while_loop to the cap)
— min over 3 solves, per-iter = wall / iters.  Oracle check: converged
energy must match the mf-CCD energy path used in rounds 2-3.

Run: python -u benchmarks/probe_r4_ccsd219.py > /tmp/probe_r4_ccsd219.out 2>&1
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
from pymes_tpu.solver import ccsd
from pymes_tpu.ops.ueg_ladder import build_block_ladder, build_ovvv_plans
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

CUT = int(os.environ.get("R4_CUT", 14))
NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj', 'aijb',
        'ijka', 'ijak', 'iajk')

t0 = time.time()
u = ueg.UEG(14, 7, 7, 0.5)
u.init_single_basis(CUT)
no, n_p = 7, u.n_spatial
nv = n_p - no
idx, vals = u.eval_2b_integrals(sp=2)
d = ueg.sparse_to_blocks(idx, vals, n_p, no, names=NEED,
                         dtype=jnp.float64)
kin = jnp.asarray(u.kinetic_energies())
eps_i = hf.calcOccupiedOrbE(kin, d['klij'], no)
eps_a = hf.calcVirtualOrbE(kin, d['aibj'], d['aijb'], no, nv)
fock = jnp.diag(jnp.concatenate([eps_i, eps_a]))
lad = build_block_ladder(u, bra="all", preslice=None)
dmf = {k: d[k] for k in NEED}
dmf['_ovvv_plans'] = build_ovvv_plans(u)
print(f"setup nP={n_p}: {time.time()-t0:.1f}s", flush=True)

for mode in ("ozaki:7:6", "ozaki:5:4"):
    cc = ccsd.CCSD(no)
    t0 = time.time()
    res = cc.solve(fock, dmf, level_shift=-1.0, max_iter=12,
                   delta_e=1e-8, ladder=lad, contract_mode=mode)
    cold = time.time() - t0
    e = res["ccsd e"]
    walls, n_it = [], 0
    for _ in range(3):
        t0 = time.time()
        r2 = cc.solve(fock, dmf, level_shift=-1.0, max_iter=12,
                      delta_e=-1.0, ladder=lad, contract_mode=mode)
        walls.append(time.time() - t0)
        n_it = len(r2["e history"])
    per = min(walls) / max(n_it, 1) * 1e3
    print(f"mf-CCSD nP=219 [{mode}]: e={e:.10f} cold={cold:.1f}s "
          f"fixed-{n_it}-iter walls={['%.2f' % w for w in walls]}s "
          f"-> {per:.1f} ms/iter", flush=True)
print("PROBE R4 CCSD219 DONE", flush=True)
