"""Probe M: nP=123 full-solve timing with hoisted preslice + stacked-slice
Ozaki ladder + ij layout.

Run: python -u benchmarks/probe_m_solve.py > /tmp/probe_m.out 2>&1
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import pymes_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from pymes_tpu.models import ueg
from pymes_tpu.mean_field import hf
from pymes_tpu.solver import ccd, mp2
from pymes_tpu.ops import ozaki
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'abcd', 'aibj', 'aijb')
u = ueg.UEG(14, 7, 7, 0.5)
u.init_single_basis(10)
no = 7
idx, vals = u.eval_2b_integrals(sp=2)
n_p = u.n_spatial
nv = n_p - no
d = ueg.sparse_to_blocks(idx, vals, n_p, no, names=NEED, dtype=jnp.float64)
kin = jnp.asarray(u.kinetic_energies())
eps_i = hf.calcOccupiedOrbE(kin, d['klij'], no)
eps_a = hf.calcVirtualOrbE(kin, d['aibj'], d['aijb'], no, n_p - no)
fock = jnp.diag(jnp.concatenate([eps_i, eps_a]))
blocks = ccd.blocks_from_dict(d)
_, T0 = mp2.solve(eps_i, eps_a, blocks.ijab, blocks.abij, -1.0)
jax.block_until_ready(T0)
print(f"nP={n_p}", flush=True)


def timeit_lad(tag, fn, *args, n1=3, n2=13):
    @partial(jax.jit, static_argnums=0)
    def run(n, *a):
        def body(i, acc):
            x = fn(*((a[0] * (1.0 + acc * 1e-300),) + a[1:]))
            return acc + jnp.sum(x).astype(jnp.float64) * 1e-300
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float64))
    float(run(n1, *args)); float(run(n2, *args))
    t0 = time.perf_counter(); float(run(n1, *args))
    t1 = time.perf_counter(); float(run(n2, *args))
    t2 = time.perf_counter()
    print(f"{tag:40s}: {((t2-t1)-(t1-t0))/(n2-n1)*1e3:8.2f} ms", flush=True)


rng = np.random.default_rng(0)
T_ij = jnp.asarray(rng.standard_normal((no, no, nv, nv)) * 1e-2)
for nsl, tc in ((7, 6), (9, 9)):
    pre = ccd.preslice_abcd(blocks.abcd, nsl, "ijab")
    jax.block_until_ready(pre[0])

    def lad_ij(T, sb, eb, nsl=nsl, tc=tc):
        sa, ea = ozaki.slice_rows(T.reshape(no * no, nv * nv), nsl)
        return ozaki.matmul_presliced(sa, ea, sb, eb,
                                      t_cutoff=tc).reshape(no, no, nv, nv)

    timeit_lad(f"ladder ij stacked ({nsl}:{tc})", lad_ij, T_ij, *pre)

for mode, layout in (("ozaki:7:6", "ijab"), ("ozaki:7:6", "abij"),
                     ("ozaki:9:9", "ijab")):
    nsl = int(mode.split(":")[1])
    pre = ccd.preslice_abcd(blocks.abcd, nsl, layout)
    jax.block_until_ready(pre[0])
    kw = dict(level_shift=-1.0, delta_e=1e-8, max_iter=60,
              contract_mode=mode, layout=layout, abcd_presliced=pre)
    out = ccd.ccd_solve_jit(fock, blocks, 7, T0, **kw)
    jax.block_until_ready(out[0])
    t0 = time.time()
    out = ccd.ccd_solve_jit(fock, blocks, 7, T0, **kw)
    n = int(out[5])
    dt = time.time() - t0
    print(f"solve[{mode:9s}|{layout}] presliced: {dt/n*1e3:7.1f} ms/iter "
          f"({n} iters, e={float(out[0]):.12f})", flush=True)
print("PROBE M DONE", flush=True)
