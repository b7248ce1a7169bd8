"""Probe I: matrix-free CCSD at nP=219 (VERDICT r1 task 6).

Round 1 was capped near nP~150 by padded dressing temporaries; this
measures the current state and the failure mode at cutoff 14.

Run: python -u benchmarks/probe_i_mf_ccsd.py > /tmp/probe_i.out 2>&1
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
from pymes_tpu.solver import ccsd as ccsd_mod
from pymes_tpu.ops.ueg_ladder import (build_ueg_ladder,
                                      build_block_ladder)
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj', 'aijb',
        'ijka', 'ijak', 'iajk')
cutoff = int(os.environ.get('MF_CUTOFF', 14))
t0 = time.time()
u = ueg.UEG(14, 7, 7, 0.5)
u.init_single_basis(cutoff)
idx, vals = u.eval_2b_integrals(sp=2)
n_p, no = u.n_spatial, 7
nv = n_p - no
lad_all = (build_ueg_ladder(u, bra="all")
           if os.environ.get("MF_PLAN") == "gather"
           else build_block_ladder(u, bra="all"))
from pymes_tpu.ops.ueg_ladder import build_ovvv_plans
plans = build_ovvv_plans(u)
print(f"cutoff={cutoff}: nP={n_p} gen={time.time()-t0:.1f}s", flush=True)
t0 = time.time()
d = ueg.sparse_to_blocks(idx, vals, n_p, no, names=NEED, dtype=jnp.float64)
kin = jnp.asarray(u.kinetic_energies())
eps_i = hf.calcOccupiedOrbE(kin, d['klij'], no)
eps_a = hf.calcVirtualOrbE(kin, d['aibj'], d['aijb'], no, nv)
fock = jnp.diag(jnp.concatenate([eps_i, eps_a]))
dict_V = {k: v for k, v in d.items() if k not in
          ('iabc', 'aibc', 'abic')}
dict_V['_ovvv_plans'] = plans
jax.block_until_ready(dict_V['abij'])
print(f"  blocks on device: {time.time()-t0:.1f}s (no ovvv blocks)",
      flush=True)

t0 = time.time()
try:
    out = ccsd_mod.ccsd_solve_jit(
        fock, dict_V, no, jnp.zeros((nv, no)),
        jnp.zeros((nv, nv, no, no)), level_shift=-1.0, delta_e=1e-8,
        max_iter=int(os.environ.get("MF_ITERS", 40)), ladder_all=lad_all,
        contract_mode=os.environ.get('MF_MODE', 'ozaki:7:6'),
        layout=os.environ.get('MF_LAYOUT', 'ijab'))
    e, n = float(out[0]), int(out[4])
    print(f"  mf-ccsd warm: e={e:.10f} iters={n} "
          f"wall={time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    out = ccsd_mod.ccsd_solve_jit(
        fock, dict_V, no, jnp.zeros((nv, no)),
        jnp.zeros((nv, nv, no, no)), level_shift=-1.0, delta_e=1e-8,
        max_iter=int(os.environ.get("MF_ITERS", 40)), ladder_all=lad_all,
        contract_mode=os.environ.get('MF_MODE', 'ozaki:7:6'),
        layout=os.environ.get('MF_LAYOUT', 'ijab'))
    n = int(out[4])
    print(f"  mf-ccsd timed: {(time.time()-t0)/n*1e3:.0f} ms/iter",
          flush=True)
except Exception as exc:  # noqa: BLE001
    print(f"  FAILED: {type(exc).__name__}", flush=True)
    print(str(exc)[:14000], flush=True)
print("PROBE I DONE", flush=True)
