"""Probe D: nP=123 UEG CCD full solve, xla-f64 vs ozaki modes, on chip.

The VERDICT r1 task-1 'done' bar: converge to the 1e-8 Ha oracle at
<= ~3x the f32 wall (~20 ms/iter, not 206).

Run: python -u benchmarks/probe_d_solve.py > /tmp/probe_d.out 2>&1
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
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'abcd', 'aibj', 'aijb')
cutoff = 10
t0 = time.time()
u = ueg.UEG(14, 7, 7, 0.5)
u.init_single_basis(cutoff)
idx, vals = u.eval_2b_integrals(sp=2)
n_p, no = u.n_spatial, 7
nv = n_p - no
print(f"cutoff={cutoff}: nP={n_p} gen={time.time()-t0:.1f}s", flush=True)
d = ueg.sparse_to_blocks(idx, vals, n_p, no, names=NEED, dtype=jnp.float64)
kin = jnp.asarray(u.kinetic_energies())
eps_i = hf.calcOccupiedOrbE(kin, d['klij'], no)
eps_a = hf.calcVirtualOrbE(kin, d['aibj'], d['aijb'], no, nv)
fock = jnp.diag(jnp.concatenate([eps_i, eps_a]))
blocks = ccd.blocks_from_dict(d)
jax.block_until_ready(blocks.abcd)
_, T0 = mp2.solve(eps_i, eps_a, blocks.ijab, blocks.abij, -1.0)
jax.block_until_ready(T0)
print("blocks on device", flush=True)

results = {}
for mode in ("ozaki:7:6", "ozaki:9:9", "xla"):
    t0 = time.time()
    out = ccd.ccd_solve_jit(fock, blocks, 7, T0, level_shift=-1.0,
                            delta_e=1e-8, max_iter=60, contract_mode=mode)
    e, n = float(out[0]), int(out[5])
    warm = time.time() - t0
    t0 = time.time()
    out = ccd.ccd_solve_jit(fock, blocks, 7, T0, level_shift=-1.0,
                            delta_e=1e-8, max_iter=60, contract_mode=mode)
    e, n = float(out[0]), int(out[5])
    wall = time.time() - t0
    results[mode] = e
    print(f"{mode:10s}: e={e:.12f} iters={n} "
          f"{wall/n*1e3:7.1f} ms/iter (warm incl compile {warm:.0f}s)",
          flush=True)

for mode, e in results.items():
    print(f"  {mode}: dE vs xla = {e - results['xla']:+.3e}", flush=True)
print("PROBE D DONE", flush=True)
