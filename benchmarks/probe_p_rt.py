"""Probe P: real-time EOM-CCSD propagation at nP=123, matrix-free
no-ovvv sigma (block ladder + OVVV gathers) — time per CIF step.

Run: python -u benchmarks/probe_p_rt.py > /tmp/probe_p.out 2>&1
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
from pymes_tpu.solver import ccd, mp2
from pymes_tpu.solver.rt_eom_ccsd import RT_EOM_CCSD
from pymes_tpu.ops.ueg_ladder import build_block_ladder, build_ovvv_plans
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj', 'aijb',
        'ijka', 'ijak', 'iajk')
u = ueg.UEG(14, 7, 7, 0.5)
u.init_single_basis(int(os.environ.get('RT_CUTOFF', 10)))
no = 7
idx, vals = u.eval_2b_integrals(sp=2)
n_p = u.n_spatial
nv = n_p - no
d = ueg.sparse_to_blocks(idx, vals, n_p, no, names=NEED, dtype=jnp.float64)
kin = jnp.asarray(u.kinetic_energies())
eps_i = hf.calcOccupiedOrbE(kin, d['klij'], no)
eps_a = hf.calcVirtualOrbE(kin, d['aibj'], d['aijb'], no, nv)
fock = jnp.diag(jnp.concatenate([eps_i, eps_a]))
print(f"nP={n_p}", flush=True)

bpa = build_block_ladder(u, bra="all")
blocks = ccd.CCDBlocks(klij=d['klij'], ijab=d['ijab'], abij=d['abij'],
                       iajb=d['iajb'], iabj=d['iabj'], abcd=None,
                       ladder=bpa)
_, T0 = mp2.solve(eps_i, eps_a, d['ijab'], d['abij'], -1.0)
out = ccd.ccd_solve_jit(fock, blocks, no, T0, level_shift=-1.0,
                        delta_e=1e-10, max_iter=80, layout="ijab")
T2 = out[1]
print(f"CCD e = {float(out[0]):.10f}", flush=True)

Vd = {k: d[k] for k in ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'ijka',
                        'ijak', 'iajk')}
Vd["abcd"] = None
Vd["abcd_ladder"] = bpa
Vd["_ovvv_plans"] = build_ovvv_plans(u)

rng = np.random.default_rng(0)
u1 = rng.standard_normal((nv, no)) + 0j
u2 = rng.standard_normal((nv, nv, no, no)) + 0j
norm = np.sqrt(np.vdot(u1, u1).real + np.vdot(u2, u2).real)
u1, u2 = u1 / norm, u2 / norm

rt = RT_EOM_CCSD(no, e_c=2.0, e_r=6.0, n_trial=1)
rt.ls_max_iter = 20
dt = 0.05
c_t = []
t0 = time.time()
u1, u2 = rt.solve(fock, Vd, T2, dt=dt, u_singles=u1, u_doubles=u2)
print(f"step 1 (incl. compile): {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
n_steps = 5
for k in range(n_steps):
    u1, u2 = rt.solve(fock, Vd, T2, dt=dt, u_singles=u1, u_doubles=u2)
    c_t.append(complex(np.vdot(u1, u1) + np.vdot(u2, u2)))
wall = time.time() - t0
print(f"RT nP={n_p} no-ovvv: {wall/n_steps:.2f} s/step "
      f"({n_steps} steps)", flush=True)
print("PROBE P DONE", flush=True)
