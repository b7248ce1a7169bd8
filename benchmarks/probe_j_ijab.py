"""Probe J: occupied-leading (ijab) loop layout vs abij, real chip, nP=123.

Run: python -u benchmarks/probe_j_ijab.py > /tmp/probe_j.out 2>&1
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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
u = ueg.UEG(14, 7, 7, 0.5)
u.init_single_basis(10)
no = 7
idx, vals = u.eval_2b_integrals(sp=2)
n_p = u.n_spatial
d = ueg.sparse_to_blocks(idx, vals, n_p, no, names=NEED, dtype=jnp.float64)
kin = jnp.asarray(u.kinetic_energies())
eps_i = hf.calcOccupiedOrbE(kin, d['klij'], no)
eps_a = hf.calcVirtualOrbE(kin, d['aibj'], d['aijb'], no, n_p - no)
fock = jnp.diag(jnp.concatenate([eps_i, eps_a]))
blocks = ccd.blocks_from_dict(d)
_, T0 = mp2.solve(eps_i, eps_a, blocks.ijab, blocks.abij, -1.0)
jax.block_until_ready(T0)
print(f"nP={n_p}", flush=True)

for mode in ("ozaki:7:6", "ozaki:9:9", "xla"):
    for layout in ("ijab", "abij"):
        out = ccd.ccd_solve_jit(fock, blocks, 7, T0, level_shift=-1.0,
                                delta_e=1e-8, max_iter=60,
                                contract_mode=mode, layout=layout)
        jax.block_until_ready(out[0])
        t0 = time.time()
        out = ccd.ccd_solve_jit(fock, blocks, 7, T0, level_shift=-1.0,
                                delta_e=1e-8, max_iter=60,
                                contract_mode=mode, layout=layout)
        n = int(out[5])
        dt = time.time() - t0
        print(f"solve[{mode:9s}|{layout}]: {dt/n*1e3:7.1f} ms/iter "
              f"({n} iters, e={float(out[0]):.12f})", flush=True)
print("PROBE J DONE", flush=True)
