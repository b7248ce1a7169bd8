"""Probe H: T2-layout penalties + solve re-time after mul+sum fixes.

Run: python -u benchmarks/probe_h_layout.py > /tmp/probe_h.out 2>&1
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
nv, no = 116, 7
N = nv * nv * no * no


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


key = jax.random.PRNGKey(0)
mk = jax.jit(lambda k, s: jax.random.normal(k, s, jnp.float32)
             .astype(jnp.float64), static_argnums=1)
x1 = mk(jax.random.PRNGKey(1), (N,))
T_abij = x1.reshape(nv, nv, no, no)
T_ijab = x1.reshape(no, no, nv, nv)
V_ijab = mk(jax.random.PRNGKey(2), (no, no, nv, nv))
jax.block_until_ready((T_abij, V_ijab))

for tag, T in (("abij (pads 18.7x)", T_abij), ("ijab (pads 1.1x)", T_ijab)):
    t = chain(lambda acc, T: acc + jnp.sum(
        dep(acc, T) * 2.0 - T * 0.5) * 1e-300, (T,))
    print(f"elementwise {tag:18s}: {t*1e3:8.2f} ms", flush=True)

t = chain(lambda acc, T, V: acc + jnp.einsum(
    "abij,ijab->", dep(acc, T), V) * 1e-300, (T_abij, V_ijab))
print(f"einsum abij,ijab-> : {t*1e3:8.2f} ms", flush=True)

t = chain(lambda acc, T, V: acc + jnp.sum(
    dep(acc, T) * jnp.transpose(V, (2, 3, 0, 1))) * 1e-300,
    (T_abij, V_ijab))
print(f"T*V^T mul+sum      : {t*1e3:8.2f} ms", flush=True)

t = chain(lambda acc, T: acc + jnp.sum(
    jnp.transpose(dep(acc, T), (2, 3, 0, 1))) * 1e-300, (T_abij,))
print(f"transpose abij->ijab: {t*1e3:8.2f} ms", flush=True)

# a representative ring einsum in both layouts
t = chain(lambda acc, T: acc + jnp.sum(jnp.einsum(
    "acik,cbkj->abij", dep(acc, T), T)) * 1e-300, (T_abij,))
print(f"ring einsum abij layout: {t*1e3:8.2f} ms", flush=True)
t = chain(lambda acc, T: acc + jnp.sum(jnp.einsum(
    "ikac,kjcb->ijab", dep(acc, T), T)) * 1e-300, (T_ijab,))
print(f"ring einsum ijab layout: {t*1e3:8.2f} ms", flush=True)

# diis after the mul+sum fix
st = diis.init_state(6, N, jnp.float64)


def body_diis(acc, st, x):
    xd = dep(acc, x)
    st2, mixed = diis.mix(st, xd, xd)
    return acc + jnp.sum(mixed) * 1e-300

print(f"diis.mix (mul+sum) : {chain(body_diis, (st, x1))*1e3:8.2f} ms",
      flush=True)

# full solve re-time
NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'abcd', 'aibj', 'aijb')
u = ueg.UEG(14, 7, 7, 0.5)
u.init_single_basis(10)
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
for mode in ("ozaki:7:6",):
    out = ccd.ccd_solve_jit(fock, blocks, 7, T0, level_shift=-1.0,
                            delta_e=1e-8, max_iter=60, contract_mode=mode)
    jax.block_until_ready(out[0])
    t0 = time.time()
    out = ccd.ccd_solve_jit(fock, blocks, 7, T0, level_shift=-1.0,
                            delta_e=1e-8, max_iter=60, contract_mode=mode)
    n = int(out[5])
    print(f"solve[{mode}]: {((time.time()-t0)/n)*1e3:7.1f} ms/iter "
          f"({n} iters, e={float(out[0]):.10f})", flush=True)
print("PROBE H DONE", flush=True)
