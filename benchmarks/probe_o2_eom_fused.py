"""Probe O2: nP=123 two-root EOM with the FUSED Davidson device step
(one dispatch per growth iteration; VERDICT r2 task 2 target <= 5 s warm).

Run: python -u benchmarks/probe_o2_eom_fused.py > /tmp/probe_o2.out 2>&1
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
from pymes_tpu.solver import ccd, eom_ccsd
from pymes_tpu.ops.ueg_ladder import build_block_ladder
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj', 'aijb',
        'ijka', 'ijak', 'iajk', 'iabc', 'abic')
u = ueg.UEG(14, 7, 7, 0.5)
u.init_single_basis(int(os.environ.get("O2_CUT", 10)))
no, n_p = 7, u.n_spatial
nv = n_p - no
idx, vals = u.eval_2b_integrals(sp=2)
d = ueg.sparse_to_blocks(idx, vals, n_p, no, names=NEED, dtype=jnp.float64)
kin = jnp.asarray(u.kinetic_energies())
eps_i = hf.calcOccupiedOrbE(kin, d['klij'], no)
eps_a = hf.calcVirtualOrbE(kin, d['aibj'], d['aijb'], no, nv)
fock = jnp.diag(jnp.concatenate([eps_i, eps_a]))
bp = build_block_ladder(u)
blocks = ccd.CCDBlocks(klij=d['klij'], ijab=d['ijab'], abij=d['abij'],
                       iajb=d['iajb'], iabj=d['iabj'], abcd=None, ladder=bp)
res = ccd.CCD(no).solve(fock, blocks, level_shift=-1.0, max_iter=60)
T2 = jnp.asarray(res["t2 amp"])
print(f"nP={n_p}: CCD e={res['ccd e']:.10f}", flush=True)

Vd = {k: d[k] for k in ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'ijka',
                        'ijak', 'iajk', 'iabc', 'abic')}
Vd["abcd"] = None
Vd["abcd_ladder"] = bp

for run in ("cold", "warm", "warm2"):
    dav = eom_ccsd.EOM_CCSD(no, n_excit=2)
    dav.max_iter = 300
    dav.contract_mode = "ozaki:7:6"
    t0 = time.time()
    e = np.sort(np.real(dav.solve(fock, Vd, T2)))
    print(f"EOM-fused[{run}]: wall={time.time()-t0:.1f}s roots={e} "
          f"iters={dav.n_iterations}", flush=True)
print("PROBE O2 DONE", flush=True)
