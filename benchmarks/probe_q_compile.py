"""Probe Q-compile: is the FEAST inhouse-GMRES worker crash a compile-
time watchdog kill?

All probe_q/probe_q_bisect configs (CGS2, GEMV, fori-MGS Arnoldi; ozaki,
xla, no-sliced, no-mulsum sigma) die ~10-11 min into the first 8-node
FEAST dispatch with "TPU worker process crashed or restarted" — a
constant across unrelated HLO, which points at the axon worker killing a
long compile rather than a kernel fault.  This probe separates the
phases: trace (host), compile (worker), execute (worker), with timing
prints between, on a PARAM-reduced program (vmap width B, restart m via
env) so compile cost can be titrated.

Run: B=2 M=10 python -u benchmarks/probe_q_compile.py
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
from pymes_tpu.solver import eom_ccsd as ec
from pymes_tpu.solver import feast_eom_ccsd as fe
from pymes_tpu.ops.ueg_ladder import build_block_ladder
from pymes_tpu.log import set_verbosity

B = int(os.environ.get("B", 2))            # vmap width (contour nodes)
M = int(os.environ.get("M", 20))           # GMRES restart
CM = os.environ.get("CM", "ozaki:7:6")     # contract mode
set_verbosity(-1)
print(f"devices: {jax.devices()} B={B} M={M} CM={CM}", flush=True)

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

f = fock
hbar = ec.build_hbar(f, Vd, T2, contract_mode=CM)
sliced = ec.preslice_sigma_hbar(Vd, hbar, T2, CM)
diag1 = np.asarray(ec.get_diag_singles(f, Vd, T2))
diag2 = np.asarray(ec.get_diag_doubles(f, Vd, T2))
diag = jnp.asarray(np.concatenate([diag1.ravel(), diag2.ravel()]))
N = diag.shape[0]
rng = np.random.default_rng(0)
b = rng.standard_normal(N)
b_pair = (jnp.asarray(b), jnp.asarray(np.zeros_like(b)))
theta = np.linspace(0.3, np.pi - 0.3, B)
z = 5.261 + 0.073 * np.exp(1j * theta)
z_pairs = (jnp.asarray(z.real), jnp.asarray(z.imag))

t0 = time.time()
lowered = fe._shifted_solve_nodes.lower(
    f, Vd, T2, b_pair, z_pairs, diag, no, nv,
    ls_max_iter=5, ls_conv_tol=1e-5, hbar=hbar, contract_mode=CM,
    linear_solver="inhouse", sigma_sliced=sliced)
print(f"traced/lowered in {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
lowered.compile()
print(f"COMPILED in {time.time()-t0:.1f}s", flush=True)
# the separate jit call cache re-compiles, but hits XLA's persistent
# disk cache seeded by the .compile() above — so this times execution
t0 = time.time()
(xr, xi), rel = fe._shifted_solve_nodes(
    f, Vd, T2, b_pair, z_pairs, diag, no, nv,
    ls_max_iter=5, ls_conv_tol=1e-5, hbar=hbar, contract_mode=CM,
    linear_solver="inhouse", sigma_sliced=sliced)
jax.block_until_ready(xr)
print(f"EXECUTED in {time.time()-t0:.1f}s max_rel={np.max(np.asarray(rel)):.2e}",
      flush=True)
