"""Round-4 probe: RT-EOM-CCSD trace at nP=123 (VERDICT r3 task 1).

Mirrors the reference RT driver (test_rt_eom_ccsd/test_rt.py:60-74 —
a step loop carrying (u1, u2) with the autocorrelation recorded per
step), but seeds with the converged MOM-Davidson Ritz vector of the
lowest excitation so the trace has a single mode: each CIF step must
rotate the autocorrelation by e^{+iE dt}, giving a per-step
phase-extracted energy to compare against the Davidson root.

Records: per-step wall ladder (cold step 0, warm steps), and
max/median |E_step − E_davidson|.

Run: python -u benchmarks/probe_r4_rt123.py > /tmp/probe_r4_rt123.out 2>&1
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
from pymes_tpu.solver.rt_eom_ccsd import RT_EOM_CCSD
from pymes_tpu.ops.ueg_ladder import build_block_ladder, build_ovvv_plans
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj', 'aijb',
        'ijka', 'ijak', 'iajk')

NT = int(os.environ.get("R4_RT_STEPS", 50))
NQUAD = int(os.environ.get("R4_RT_NQUAD", 32))
DT = float(os.environ.get("R4_RT_DT", 0.1))

t_all = time.time()
u = ueg.UEG(14, 7, 7, 0.5)
u.init_single_basis(10)
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
print(f"nP={n_p}: CCD e={res['ccd e']:.10f} setup={time.time()-t_all:.0f}s",
      flush=True)
Vd = {k: d[k] for k in ('klij', 'ijab', 'abij', 'iajb', 'iabj',
                        'ijka', 'ijak', 'iajk')}
Vd["abcd"] = None
Vd["abcd_ladder"] = bp_all
Vd["_ovvv_plans"] = build_ovvv_plans(u)

# seed: converged Ritz vector of the lowest root (MOM-tracked mixed)
t0 = time.time()
dav = EOM_CCSD(no, n_excit=2)
dav.contract_mode = "ozaki:7:6"
e_dav = np.sort(np.real(dav.solve(fock, Vd, T2)))
print(f"Davidson: roots={e_dav} wall={time.time()-t0:.1f}s "
      f"iters={dav.n_iterations}", flush=True)
u1 = np.asarray(dav.u_singles[0], dtype=complex)
u2 = np.asarray(dav.u_doubles[0], dtype=complex)

rt = RT_EOM_CCSD(no, e_c=float(e_dav[0]), e_r=0.5, n_quad=NQUAD,
                 ls_conv_tol=1e-6)
rt.contract_mode = "ozaki:7:6"

walls, e_steps = [], []
for k in range(NT):
    t0 = time.time()
    u1n, u2n = rt.solve(fock, Vd, T2, dt=DT, u_singles=u1, u_doubles=u2)
    walls.append(time.time() - t0)
    ratio = (np.tensordot(np.conj(u1), u1n, axes=2)
             + np.tensordot(np.conj(u2), u2n, axes=4))
    e_steps.append(np.angle(ratio) / DT)
    u1, u2 = u1n, u2n
    if k < 3 or (k + 1) % 10 == 0:
        print(f"  step {k}: wall={walls[-1]:.2f}s E={e_steps[-1]:.10f} "
              f"max_ls_res={np.max(rt.last_ls_residuals):.2e}", flush=True)

e_steps = np.array(e_steps)
warm = np.array(walls[1:])
print(f"RT nP=123 n_quad={NQUAD} dt={DT} steps={NT}: cold step "
      f"{walls[0]:.1f}s, warm median {np.median(warm):.2f}s "
      f"(min {warm.min():.2f}, max {warm.max():.2f})", flush=True)
print(f"|E_step - E_davidson|: median "
      f"{np.median(np.abs(e_steps - e_dav[0])):.3e}, max "
      f"{np.max(np.abs(e_steps - e_dav[0])):.3e}", flush=True)
print(f"PROBE R4 RT123 DONE total={time.time()-t_all:.0f}s", flush=True)
