"""Probe Q-RT64: a 64-node RT-EOM-CCSD step with the ozaki sigma inside
the shifted solves (VERDICT r2 task 1 done-criterion: "a 64-node RT step
run with ozaki sigma inside the solves, energies matching the xla path").

The 64 contour nodes dispatch in max_nodes_per_dispatch chunks (the axon
worker's compile watchdog caps the batched program size — probe_q_compile);
the persistent compile cache makes every chunk after the first hot.

Run: python -u benchmarks/probe_q_rt64.py > /tmp/probe_rt64.out 2>&1
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
from pymes_tpu.solver.rt_eom_ccsd import RT_EOM_CCSD
from pymes_tpu.ops.ueg_ladder import build_block_ladder
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj', 'aijb',
        'ijka', 'ijak', 'iajk', 'iabc', 'abic')
cutoff = int(os.environ.get("RT64_CUTOFF", 10))
u = ueg.UEG(14, 7, 7, 0.5)
u.init_single_basis(cutoff)
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
                       iajb=d['iajb'], iabj=d['iabj'], abcd=None,
                       ladder=bp)
res = ccd.CCD(no).solve(fock, blocks, level_shift=-1.0, max_iter=60)
T2 = jnp.asarray(res["t2 amp"])
print(f"cutoff={cutoff} nP={n_p}: CCD e={res['ccd e']:.10f}", flush=True)

Vd = {k: d[k] for k in ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'ijka',
                        'ijak', 'iajk', 'iabc', 'abic')}
Vd["abcd"] = None
Vd["abcd_ladder"] = bp

rng = np.random.default_rng(4)
u1 = rng.standard_normal((nv, no))
u2 = rng.standard_normal((nv, nv, no, no)) * 0.01
outs = {}
for tag, backend, mode in (("inhouse+ozaki", "inhouse", "ozaki:7:6"),
                           ("jsp+xla", "jsp", "xla")):
    r = RT_EOM_CCSD(no, e_c=5.26, e_r=1.0, n_quad=64)
    r.ls_backend = backend
    r.contract_mode = mode
    r.ls_max_iter = 40
    r.ls_conv_tol = 1e-6
    for run in ("cold", "warm"):
        t0 = time.time()
        q1, q2 = r.solve(fock, Vd, T2, dt=0.05, u_singles=u1,
                         u_doubles=u2)
        print(f"RT64[{tag}|{run}]: wall={time.time()-t0:.1f}s "
              f"max_ls_res={np.max(r.last_ls_residuals):.2e}", flush=True)
    outs[tag] = (np.asarray(q1), np.asarray(q2))

a = np.concatenate([outs["inhouse+ozaki"][0].ravel(),
                    outs["inhouse+ozaki"][1].ravel()])
b = np.concatenate([outs["jsp+xla"][0].ravel(),
                    outs["jsp+xla"][1].ravel()])
ov = abs(np.vdot(a, b)) / (np.linalg.norm(a) * np.linalg.norm(b))
print(f"RT64: |<inhouse|jsp>| = {ov:.12f} (1 - ov = {1-ov:.3e})",
      flush=True)
print("PROBE RT64 DONE", flush=True)
