"""Probe O: matrix-free EOM-CCSD Davidson at nP=123 — round-1 config
(gather plan, xla sigma) vs round-2 (block plan, ozaki sigma).

Run: python -u benchmarks/probe_o_eom.py > /tmp/probe_o.out 2>&1
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
from pymes_tpu.solver import ccd, eom_ccsd, mp2
from pymes_tpu.ops.ueg_ladder import build_block_ladder, build_ueg_ladder
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj', 'aijb',
        'ijka', 'ijak', 'iajk', 'iabc', 'abic')
u = ueg.UEG(14, 7, 7, 0.5)
u.init_single_basis(10)
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

# ground state via matrix-free CCD (Γ-point: T1 = 0, CCSD ≡ CCD)
bp = build_block_ladder(u)
blocks = ccd.CCDBlocks(klij=d['klij'], ijab=d['ijab'], abij=d['abij'],
                       iajb=d['iajb'], iabj=d['iabj'], abcd=None, ladder=bp)
_, T0 = mp2.solve(eps_i, eps_a, d['ijab'], d['abij'], -1.0)
out = ccd.ccd_solve_jit(fock, blocks, no, T0, level_shift=-1.0,
                        delta_e=1e-10, max_iter=80,
                        contract_mode="ozaki:7:6", layout="ijab")
T2 = out[1]
print(f"CCD e = {float(out[0]):.10f} ({int(out[5])} iters)", flush=True)

Vd = {k: d[k] for k in ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'ijka',
                        'ijak', 'iajk', 'iabc', 'abic')}
Vd["abcd"] = None

from pymes_tpu.ops.ueg_ladder import build_ovvv_plans

bpa = build_block_ladder(u, bra="all")
Vd_noovvv = {k: v for k, v in Vd.items() if k not in ("iabc", "abic")}
Vd_noovvv["_ovvv_plans"] = build_ovvv_plans(u)

for tag, V0, plan, mode in (
        ("block+ozaki", Vd, bp, "ozaki:7:6"),
        ("block+ozaki NO-OVVV", Vd_noovvv, bpa, "ozaki:7:6"),
        ("gather+xla (round1)", Vd, build_ueg_ladder(u), "xla")):
    Vmf = dict(V0)
    Vmf["abcd_ladder"] = plan
    for run in ("cold", "warm"):
        dav = eom_ccsd.EOM_CCSD(no, n_excit=2)
        dav.max_iter = 300
        dav.contract_mode = mode
        t0 = time.time()
        e = np.sort(dav.solve(fock, Vmf, T2))
        print(f"EOM[{tag}|{run}]: wall={time.time()-t0:.1f}s roots={e}",
              flush=True)
print("PROBE O DONE", flush=True)
