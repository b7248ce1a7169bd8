"""Probe F: nP=123 solve after the incremental-B DIIS; bisect leftovers.

Run: python -u benchmarks/probe_f_diis.py > /tmp/probe_f.out 2>&1
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
from pymes_tpu.mixer import diis
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'abcd', 'aibj', 'aijb')
u = ueg.UEG(14, 7, 7, 0.5)
u.init_single_basis(10)
idx, vals = u.eval_2b_integrals(sp=2)
n_p, no = u.n_spatial, 7
nv = n_p - no
d = ueg.sparse_to_blocks(idx, vals, n_p, no, names=NEED, dtype=jnp.float64)
kin = jnp.asarray(u.kinetic_energies())
eps_i = hf.calcOccupiedOrbE(kin, d['klij'], no)
eps_a = hf.calcVirtualOrbE(kin, d['aibj'], d['aijb'], no, nv)
fock = jnp.diag(jnp.concatenate([eps_i, eps_a]))
blocks = ccd.blocks_from_dict(d)
_, T = mp2.solve(eps_i, eps_a, blocks.ijab, blocks.abij, -1.0)
jax.block_until_ready(T)
print(f"nP={n_p} ready", flush=True)


def chain(make_body, args, n1=3, n2=9):
    @partial(jax.jit, static_argnums=(0,))
    def run(n, *a):
        def body(i, acc):
            return make_body(acc, *a)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float64))

    float(run(n1, *args)); float(run(n2, *args))
    t0 = time.perf_counter(); float(run(n1, *args))
    t1 = time.perf_counter(); float(run(n2, *args))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


def dep(acc, x):
    return x * (1.0 + acc * 1e-300)


st = diis.init_state(6, nv * nv * no * no, T.dtype)


def body_diis(acc, st, T):
    Td = dep(acc, T)
    st2, mixed = diis.mix(st, Td.ravel(), Td.ravel())
    return acc + jnp.sum(mixed) * 1e-300

print(f"diis.mix (incr B) : {chain(body_diis, (st, T))*1e3:8.2f} ms",
      flush=True)

# DIIS sub-pieces
def body_insert(acc, st, T):
    Td = dep(acc, T)
    amps = st.amps.at[0].set(Td.ravel())
    return acc + jnp.sum(amps[0]) * 1e-300

print(f"  ring insert x1  : {chain(body_insert, (st, T))*1e3:8.2f} ms",
      flush=True)


def body_row(acc, st, T):
    Td = dep(acc, T).ravel()
    row = st.errs @ Td
    return acc + jnp.sum(row) * 1e-300

print(f"  gram row matvec : {chain(body_row, (st, T))*1e3:8.2f} ms",
      flush=True)


def body_mixout(acc, st):
    c = jnp.full((6,), 1.0 / 6, T.dtype) * (1.0 + acc * 1e-300)
    mixed = c @ st.amps
    return acc + jnp.sum(mixed) * 1e-300

print(f"  coeff @ amps    : {chain(body_mixout, (st,))*1e3:8.2f} ms",
      flush=True)


def body_solve(acc, st):
    L = jnp.eye(7, dtype=jnp.float64) * (1.0 + acc * 1e-300)
    rhs = jnp.zeros(7, jnp.float64).at[6].set(-1.0)
    x = diis._gauss_solve(L, rhs)
    return acc + jnp.sum(x) * 1e-300

print(f"  gauss solve 7x7 : {chain(body_solve, (st,))*1e3:8.2f} ms",
      flush=True)

# full solve per-iter, both modes
for mode in ("ozaki:7:6",):
    out = ccd.ccd_solve_jit(fock, blocks, 7, T, level_shift=-1.0,
                            delta_e=1e-8, max_iter=60, contract_mode=mode)
    jax.block_until_ready(out[0])
    t0 = time.time()
    out = ccd.ccd_solve_jit(fock, blocks, 7, T, level_shift=-1.0,
                            delta_e=1e-8, max_iter=60, contract_mode=mode)
    n = int(out[5])
    print(f"solve[{mode}]: {((time.time()-t0)/n)*1e3:7.1f} ms/iter "
          f"({n} iters, e={float(out[0]):.10f})", flush=True)

print("PROBE F DONE", flush=True)
