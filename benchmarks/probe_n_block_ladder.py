"""Probe N: momentum-block-diagonal ladder at nP=219 — apply cost vs the
gather plan, and the full matrix-free CCD solve (block plan + ozaki ring
terms + ij layout).

Run: python -u benchmarks/probe_n_block_ladder.py > /tmp/probe_n.out 2>&1
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
from pymes_tpu.ops.ueg_ladder import (build_block_ladder, build_ueg_ladder,
                                      block_ladder_apply_ij,
                                      block_ladder_apply)
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

u = ueg.UEG(14, 7, 7, 0.5)
u.init_single_basis(14)
no = 7
n_p = u.n_spatial
nv = n_p - no
t0 = time.time()
bp = build_block_ladder(u)
t_build = time.time() - t0
nnz = sum(int(np.prod(g.blocks.shape)) for g in bp.groups)
print(f"nP={n_p} build={t_build:.1f}s padded-nnz={nnz} "
      f"({nnz*8/1e6:.0f} MB) groups={[tuple(g.blocks.shape) for g in bp.groups]}",
      flush=True)
t0 = time.time()
bpa = build_block_ladder(u, bra="all")
nnz_a = sum(int(np.prod(g.blocks.shape)) for g in bpa.groups)
print(f"all-bra build={time.time()-t0:.1f}s padded-nnz={nnz_a} "
      f"({nnz_a*8/1e6:.0f} MB)", flush=True)

rng = np.random.default_rng(0)
T_ij = jnp.asarray(rng.standard_normal((no, no, nv, nv)) * 1e-2)
T_ab = jnp.transpose(T_ij, (2, 3, 0, 1))
jax.block_until_ready((T_ij, T_ab))


def timeit(tag, fn, *args, n1=2, n2=8):
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
    print(f"{tag:44s}: {((t2-t1)-(t1-t0))/(n2-n1)*1e3:8.2f} ms", flush=True)


timeit("block ladder ij (vbra)", lambda T, P: block_ladder_apply_ij(P, T),
       T_ij, bp)
timeit("block ladder ab (vbra)", lambda T, P: block_ladder_apply(P, T),
       T_ab, bp)
timeit("block ladder ij (all-bra)",
       lambda T, P: block_ladder_apply_ij(P, T), T_ij, bpa)

# full mf-CCD solve: block plan, ij layout, ozaki ring terms
idx, vals = u.eval_2b_integrals(sp=2)
NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj', 'aijb')
d = ueg.sparse_to_blocks(idx, vals, n_p, no, names=NEED, dtype=jnp.float64)
kin = jnp.asarray(u.kinetic_energies())
eps_i = hf.calcOccupiedOrbE(kin, d['klij'], no)
eps_a = hf.calcVirtualOrbE(kin, d['aibj'], d['aijb'], no, nv)
fock = jnp.diag(jnp.concatenate([eps_i, eps_a]))
_, T0 = mp2.solve(eps_i, eps_a, d['ijab'], d['abij'], -1.0)
jax.block_until_ready(T0)

for plan, tag in ((bp, "block"), (build_ueg_ladder(u), "gather")):
    for mode, layout in (("ozaki:7:6", "ijab"), ("xla", "abij")):
        if tag == "gather" and layout == "ijab":
            continue
        blocks = ccd.CCDBlocks(klij=d['klij'], ijab=d['ijab'],
                               abij=d['abij'], iajb=d['iajb'],
                               iabj=d['iabj'], abcd=None, ladder=plan)
        kw = dict(level_shift=-1.0, delta_e=1e-8, max_iter=60,
                  contract_mode=mode, layout=layout)
        out = ccd.ccd_solve_jit(fock, blocks, no, T0, **kw)
        jax.block_until_ready(out[0])
        t0 = time.time()
        out = ccd.ccd_solve_jit(fock, blocks, no, T0, **kw)
        n = int(out[5])
        print(f"mf-CCD[{tag}|{mode}|{layout}]: "
              f"{(time.time()-t0)/n*1e3:7.1f} ms/iter ({n} iters, "
              f"e={float(out[0]):.10f})", flush=True)
print("PROBE N DONE", flush=True)
