"""Probe L: matrix-free gather ladder, abij vs ijab accumulator layout,
at nP=219 (the mf-CCSD scale). Also the xla-f64 ring einsum in both
layouts at this size.

Run: python -u benchmarks/probe_l_mf_layout.py > /tmp/probe_l.out 2>&1
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
from pymes_tpu.ops.ueg_ladder import (build_ueg_ladder, ueg_ladder_apply,
                                      ueg_ladder_apply_ij)
from pymes_tpu.ops.contract import contract
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

u = ueg.UEG(14, 7, 7, 0.5)
u.init_single_basis(14)
no = 7
n_p = u.n_spatial
nv = n_p - no
lad = build_ueg_ladder(u)                 # virtual-bra (CCD)
lad_all = build_ueg_ladder(u, bra="all")  # all-bra (CCSD W)
print(f"nP={n_p} nq={lad.w.shape[0]} nq_all={lad_all.w.shape[0]}",
      flush=True)

rng = np.random.default_rng(0)
T_ab = jnp.asarray(rng.standard_normal((nv, nv, no, no)) * 1e-2)
T_ij = jnp.transpose(T_ab, (2, 3, 0, 1))
jax.block_until_ready((T_ab, T_ij))


def timeit(tag, fn, *args, n1=1, n2=3):
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
    dt = ((t2 - t1) - (t1 - t0)) / (n2 - n1)
    print(f"{tag:44s}: {dt*1e3:8.2f} ms", flush=True)
    return dt


timeit("gather ladder abij (vbra)",
       lambda T, L: ueg_ladder_apply(L, T), T_ab, lad)
timeit("gather ladder ijab (vbra)",
       lambda T, L: ueg_ladder_apply_ij(L, T), T_ij, lad)
timeit("gather ladder abij (all-bra)",
       lambda T, L: ueg_ladder_apply(L, T), T_ab, lad_all)
timeit("gather ladder ijab (all-bra)",
       lambda T, L: ueg_ladder_apply_ij(L, T), T_ij, lad_all)

# chunked variants
for ch in (8, 32):
    timeit(f"gather ladder ijab (vbra, chunk={ch})",
           lambda T, L, c=ch: ueg_ladder_apply_ij(L, T, chunk=c), T_ij, lad)

# ring-type einsum at this size, xla f64 vs ozaki, both layouts
MODE = "ozaki:7:6"
V_ij = jnp.asarray(rng.standard_normal((no, no, nv, nv)) * 1e-2)
timeit("ring einsum ijab ozaki",
       lambda T, V: contract("klcd,ljdb->kjcb", V, T, mode=MODE), T_ij, V_ij)
timeit("ring einsum ijab xla-f64",
       lambda T, V: jnp.einsum("klcd,ljdb->kjcb", V, T), T_ij, V_ij)
V_ab = jnp.transpose(V_ij, (2, 3, 0, 1))
timeit("ring einsum abij ozaki",
       lambda T, V: contract("klcd,dblj->cbkj", V, T, mode=MODE),
       T_ab, V_ij)
timeit("ring einsum abij xla-f64",
       lambda T, V: jnp.einsum("klcd,dblj->cbkj", V, T), T_ab, V_ij)
print("PROBE L DONE", flush=True)
