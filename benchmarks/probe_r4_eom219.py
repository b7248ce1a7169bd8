"""Round-4 probe: two-root fused-Davidson EOM at nP=219 (VERDICT r3
task 5) with the Γ-point consistency oracle — at the Γ point T1 ≡ 0, so
EOM on mf-CCSD amplitudes must give the same roots as EOM on mf-CCD
amplitudes (the dressed operator reduces to the bare one).

Matrix-free no-ovvv config throughout (gather plans + all-bra block
ladder, ozaki:7:6 sigma) — the production path at this size; a dense
ovvv block would be nv³no ≈ 0.5 GB × several.

Run: python -u benchmarks/probe_r4_eom219.py > /tmp/probe_r4_eom219.out 2>&1
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
from pymes_tpu.solver import ccd, ccsd
from pymes_tpu.solver.eom_ccsd import EOM_CCSD
from pymes_tpu.ops.ueg_ladder import build_block_ladder, build_ovvv_plans
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

CUT = int(os.environ.get("R4_EOM_CUT", 14))    # 14 -> nP=219
NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj', 'aijb',
        'ijka', 'ijak', 'iajk')

t_all = time.time()
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
bp_all = build_block_ladder(u, bra="all")
plans = build_ovvv_plans(u)
print(f"setup nP={n_p}: {time.time()-t_all:.1f}s", flush=True)

blocks = ccd.CCDBlocks(klij=d['klij'], ijab=d['ijab'], abij=d['abij'],
                       iajb=d['iajb'], iabj=d['iabj'], abcd=None,
                       ladder=bp_all)
t0 = time.time()
res_ccd = ccd.CCD(no).solve(fock, blocks, level_shift=-1.0, max_iter=60,
                            contract_mode="ozaki:7:6")
print(f"mf-CCD nP=219: e={res_ccd['ccd e']:.10f} "
      f"wall={time.time()-t0:.1f}s", flush=True)
T2_ccd = jnp.asarray(res_ccd["t2 amp"])

# Γ-point mf-CCSD: T1 must converge to ~0 and the energy to the CCD one
dmf = {k: d[k] for k in ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj',
                         'aijb', 'ijka', 'ijak', 'iajk')}
dmf['_ovvv_plans'] = plans
t0 = time.time()
res_ccsd = ccsd.CCSD(no).solve(fock, dmf, level_shift=-1.0, max_iter=60,
                               ladder=bp_all, contract_mode="ozaki:7:6")
t1n = float(jnp.max(jnp.abs(res_ccsd["t1"])))
print(f"mf-CCSD nP=219: e={res_ccsd['ccsd e']:.10f} "
      f"wall={time.time()-t0:.1f}s |T1|max={t1n:.2e} "
      f"|e_ccsd - e_ccd|={abs(res_ccsd['ccsd e']-res_ccd['ccd e']):.2e}",
      flush=True)

Vd = dict(dmf)
Vd["abcd"] = None
Vd["abcd_ladder"] = bp_all

walls = {}
roots = {}
for tag, T2op in (("ccd-amps", T2_ccd),
                  ("ccsd-amps", jnp.asarray(res_ccsd["t2"]))):
    dav = EOM_CCSD(no, n_excit=2)
    dav.max_iter = 300
    dav.contract_mode = "ozaki:7:6"
    t0 = time.time()
    ev = np.sort(np.real(dav.solve(fock, Vd, T2op)))
    cold = time.time() - t0
    t0 = time.time()
    ev2 = np.sort(np.real(dav.solve(fock, Vd, T2op)))
    warm = time.time() - t0
    walls[tag] = (cold, warm)
    roots[tag] = ev2
    print(f"EOM[{tag}] nP=219: roots={ev2} cold={cold:.1f}s "
          f"warm={warm:.1f}s iters={dav.n_iterations}", flush=True)

dev = np.max(np.abs(roots["ccd-amps"] - roots["ccsd-amps"]))
print(f"Γ-point consistency |roots(CCD amps) - roots(CCSD amps)| "
      f"= {dev:.3e} (T1≡0 ⇒ must match)", flush=True)
print(f"PROBE R4 EOM219 DONE total={time.time()-t_all:.0f}s", flush=True)
