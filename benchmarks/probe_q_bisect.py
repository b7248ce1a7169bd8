"""Probe Q-bisect: which ingredient of the FEAST inhouse+ozaki shifted
solve faults the axon TPU worker?

probe_q runs (2026-08-18) crash the worker in the 8-node vmapped GMRES
dispatch with BOTH Arnoldi forms (CGS2 GEMV and fori-MGS), so the
orthogonalisation is exonerated.  The suspects are the round-3 additions
to the sigma inside the matvec: the shared-slice sigma (sigma_sliced /
preslice_sigma_hbar) and the plan-attached int8 ladder slices.  Each
config runs in its own subprocess (a worker fault kills the client);
configs are bisected one per run via the CFG env var:

  CFG=nosliced   inhouse GMRES, ozaki sigma, sigma_sliced=None
  CFG=noladder   inhouse GMRES, ozaki sigma, sliced sigma, presliced=None
  CFG=xla        inhouse GMRES, xla sigma (no ozaki anywhere)
  CFG=full       the production config (expected to crash)

Run: CFG=... python -u benchmarks/probe_q_bisect.py
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
from pymes_tpu.solver import feast_eom_ccsd as fe
from pymes_tpu.solver.feast_eom_ccsd import FEAST_EOM_CCSD
from pymes_tpu.ops.ueg_ladder import build_block_ladder
from pymes_tpu.log import set_verbosity

CFG = os.environ.get("CFG", "nosliced")
set_verbosity(-1)
print("devices:", jax.devices(), "CFG:", CFG, flush=True)

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj', 'aijb',
        'ijka', 'ijak', 'iajk', 'iabc', 'abic')

u = ueg.UEG(14, 7, 7, 0.5)
u.init_single_basis(5)
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
print(f"CCD e={res['ccd e']:.10f}", flush=True)

Vd = {k: d[k] for k in ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'ijka',
                        'ijak', 'iajk', 'iabc', 'abic')}
Vd["abcd"] = None
Vd["abcd_ladder"] = bp

if CFG == "noladder":
    Vd["abcd_ladder"] = bp._replace(presliced=None)

if CFG == "nosliced":
    _orig = fe.preslice_sigma_hbar
    fe.preslice_sigma_hbar = lambda *a, **k: None

if CFG == "nomulsum":
    # production ozaki config, mul+sum lowering disabled at trace time
    from pymes_tpu.ops import contract as _ct
    _ct._MULSUM_ENABLED = False

# roots measured by probe_q at this cutoff: 5.2429519, 5.27890291
s = FEAST_EOM_CCSD(no, e_c=5.261, e_r=0.073, n_trial=4, max_iter=2,
                   n_quad=8, seed=11, n_excit=2, ls_conv_tol=1e-5)
s.ls_backend = "jsp" if CFG == "xla-jsp" else "inhouse"
s.contract_mode = "xla" if CFG.startswith("xla") else "ozaki:7:6"
s.ls_max_iter = 40
t0 = time.time()
ev = np.sort(np.real(s.solve(fock, Vd, T2)))
print(f"CFG={CFG}: SURVIVED wall={time.time()-t0:.1f}s ev={ev} "
      f"max_ls_res={np.max(s.last_ls_residuals):.2e}", flush=True)
