"""Probe O4: isolate the sliced-sigma effect at nP=123 — one batched
sigma dispatch (batch=2) timed with sliced=None vs presliced, plus the
full two-root Davidson both ways.

Run: timeout 2400 python -u benchmarks/probe_o4_sigma_sliced.py > /tmp/probe_o4.out 2>&1
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
from pymes_tpu.ops.ueg_ladder import build_block_ladder, build_ovvv_plans
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj', 'aijb',
        'ijka', 'ijak', 'iajk', 'iabc', 'abic')
u = ueg.UEG(14, 7, 7, 0.5)
u.init_single_basis(10)
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
Vd["_ovvv_plans"] = build_ovvv_plans(u)
CM = "ozaki:7:6"
hb = eom_ccsd.build_hbar(fock, Vd, T2, contract_mode=CM)
sl = eom_ccsd.preslice_sigma_hbar(Vd, hb, T2, CM)
jax.block_until_ready(hb.A1)

rng = np.random.default_rng(0)
U1 = jnp.asarray(rng.standard_normal((2, nv, no)))
U2 = jnp.asarray(rng.standard_normal((2, nv, nv, no, no)))
jax.block_until_ready((U1, U2))

for tag, s in (("plain", None), ("sliced", sl)):
    t0 = time.time()
    out = eom_ccsd._sigma_batched_hbar(fock, Vd, hb, U1, U2, T2,
                                       contract_mode=CM, sliced=s)
    jax.block_until_ready(out)
    print(f"  [sigma batch=2 {tag} compile {time.time()-t0:.1f}s]",
          flush=True)
    for _ in range(2):
        jax.block_until_ready(eom_ccsd._sigma_batched_hbar(
            fock, Vd, hb, U1, U2, T2, contract_mode=CM, sliced=s))
    t0 = time.time()
    n = 10
    for _ in range(n):
        out = eom_ccsd._sigma_batched_hbar(fock, Vd, hb, U1, U2, T2,
                                           contract_mode=CM, sliced=s)
    jax.block_until_ready(out)
    print(f"sigma batch=2 {tag}: {(time.time()-t0)/n*1e3:.1f} ms", flush=True)

# full Davidson with preslice disabled (monkeypatch)
orig = eom_ccsd.preslice_sigma_hbar
for tag, fn in (("nosliced", lambda *a: None), ("sliced", orig)):
    eom_ccsd.preslice_sigma_hbar = fn
    dav = eom_ccsd.EOM_CCSD(no, n_excit=2)
    dav.max_iter = 300
    dav.contract_mode = CM
    t0 = time.time()
    e = np.sort(np.real(dav.solve(fock, Vd, T2)))
    print(f"Davidson[{tag}]: wall={time.time()-t0:.1f}s roots={e} "
          f"iters={dav.n_iterations}", flush=True)
    t0 = time.time()
    e = np.sort(np.real(dav.solve(fock, Vd, T2)))
    print(f"Davidson[{tag} warm]: wall={time.time()-t0:.1f}s roots={e}",
          flush=True)
eom_ccsd.preslice_sigma_hbar = orig
print("PROBE O4 DONE", flush=True)
