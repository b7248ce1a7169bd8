"""Probe W3: PRODUCTION solves at nP=219 with the shared-slice ring
engine — ccd_solve_jit / ccsd_solve_jit per-iteration steady state.
(Standalone-iteration probes overstate slicing cost: inside the solver
while_loop, XLA's invariant-code motion hoists the bare-block slicing —
ijab is identity-dressed — out of the loop.)

Run: timeout 3000 python -u benchmarks/probe_w4_ccsd.py > /tmp/probe_w4.out 2>&1
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
from pymes_tpu.solver import ccd as ccd_mod
from pymes_tpu.solver import ccsd as ccsd_mod
from pymes_tpu.solver import mp2
from pymes_tpu.ops.ueg_ladder import build_block_ladder, build_ovvv_plans
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj', 'aijb',
        'ijka', 'ijak', 'iajk')
u = ueg.UEG(14, 7, 7, 0.5)
u.init_single_basis(14)
no, n_p = 7, u.n_spatial
nv = n_p - no
idx, vals = u.eval_2b_integrals(sp=2)
lad_all = build_block_ladder(u, bra="all")
lad = build_block_ladder(u)
plans = build_ovvv_plans(u)
d = ueg.sparse_to_blocks(idx, vals, n_p, no, names=NEED, dtype=jnp.float64)
kin = jnp.asarray(u.kinetic_energies())
eps_i = hf.calcOccupiedOrbE(kin, d['klij'], no)
eps_a = hf.calcVirtualOrbE(kin, d['aibj'], d['aijb'], no, nv)
fock = jnp.diag(jnp.concatenate([eps_i, eps_a]))
dict_V = {k: v for k, v in d.items()}
dict_V["_ovvv_plans"] = plans
dict_V["abij_t"] = jnp.transpose(d["abij"], (2, 3, 0, 1))
blocks = ccd_mod.CCDBlocks(klij=d['klij'], ijab=d['ijab'], abij=d['abij'],
                           iajb=d['iajb'], iabj=d['iabj'], abcd=None,
                           ladder=lad)
print(f"nP={n_p}", flush=True)
_, T0 = mp2.solve(eps_i, eps_a, d['ijab'], d['abij'], -1.0)
T10 = jnp.zeros((nv, no))
jax.block_until_ready(T0)

dict_V_l = dict(dict_V)
for mode in ("ozaki:7:6", "ozaki:5:4"):
    t0 = time.time()
    out = ccsd_mod.ccsd_solve_jit(fock, dict_V_l, no, T10, T0,
                                  level_shift=-1.0, delta_e=1e-8,
                                  max_iter=60, contract_mode=mode,
                                  layout="ijab", ladder_all=lad_all)
    e, it = float(out[0]), int(out[4])
    print(f"  [ccsd {mode} compile+first {time.time()-t0:.1f}s "
          f"e={e:.12f} iters={it}]", flush=True)
    t0 = time.time()
    out = ccsd_mod.ccsd_solve_jit(fock, dict_V_l, no, T10, T0,
                                  level_shift=-1.0, delta_e=1e-8,
                                  max_iter=60, contract_mode=mode,
                                  layout="ijab", ladder_all=lad_all)
    e, it = float(out[0]), int(out[4])
    wall = time.time() - t0
    print(f"mf-CCSD solve {mode}: e={e:.12f} iters={it} "
          f"wall={wall:.2f}s per-iter={wall/max(it,1)*1e3:.1f} ms",
          flush=True)
print("PROBE W4 DONE", flush=True)
