"""Probe G: why skinny f64 dots/reductions are ~60x off roofline; compare
lowering variants and T2 layouts.

Run: python -u benchmarks/probe_g_reductions.py > /tmp/probe_g.out 2>&1
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
E = mk(key, (6, N))
x1 = mk(jax.random.PRNGKey(1), (N,))
jax.block_until_ready((E, x1))

t = chain(lambda acc, E, x: acc + jnp.sum(E @ dep(acc, x)) * 1e-300, (E, x1))
print(f"(6,N)@N dot        : {t*1e3:8.2f} ms", flush=True)

t = chain(lambda acc, E, x: acc + jnp.sum(
    jnp.sum(E * dep(acc, x)[None, :], axis=1)) * 1e-300, (E, x1))
print(f"(6,N)*N mul+sum    : {t*1e3:8.2f} ms", flush=True)

E3 = E.reshape(6, -1, 128)
x3 = x1.reshape(-1, 128)
t = chain(lambda acc, E, x: acc + jnp.sum(
    jnp.sum(E * dep(acc, x)[None], axis=(1, 2))) * 1e-300, (E3, x3))
print(f"(6,m,128) mul+sum  : {t*1e3:8.2f} ms", flush=True)

t = chain(lambda acc, x: acc + jnp.sum(dep(acc, x) * x) * 1e-300, (x1,))
print(f"sum(x*y) N f64     : {t*1e3:8.2f} ms", flush=True)

t = chain(lambda acc, x: acc + jnp.sum(
    (dep(acc, x) * x).astype(jnp.float32)).astype(jnp.float64) * 1e-300,
    (x1,))
print(f"sum f32 cast       : {t*1e3:8.2f} ms", flush=True)

# elementwise on 4D layouts
T_abij = x1.reshape(nv, nv, no, no)
T_ijab = x1.reshape(no, no, nv, nv)
for tag, T in (("abij (pads 18.7x)", T_abij), ("ijab (pads 1.1x)", T_ijab)):
    t = chain(lambda acc, T: acc + jnp.sum(
        dep(acc, T) * 2.0 - T * 0.5) * 1e-300, (T,))
    print(f"elementwise {tag:18s}: {t*1e3:8.2f} ms", flush=True)

# energy-style reduction, both layouts
V_ijab = mk(jax.random.PRNGKey(2), (no, no, nv, nv))
t = chain(lambda acc, T, V: acc + jnp.einsum(
    "abij,ijab->", dep(acc, T), V) * 1e-300, (T_abij, V_ijab))
print(f"einsum abij,ijab-> : {t*1e3:8.2f} ms", flush=True)
t = chain(lambda acc, T, V: acc + jnp.sum(
    dep(acc, T).reshape(nv * nv, no * no)
    * V.reshape(no * no, nv * nv).T) * 1e-300, (T_abij, V_ijab))
print(f"reshaped mul+sum   : {t*1e3:8.2f} ms", flush=True)

# transpose cost abij <-> ijab
t = chain(lambda acc, T: acc + jnp.sum(
    jnp.transpose(dep(acc, T), (2, 3, 0, 1))) * 1e-300, (T_abij,))
print(f"transpose abij->ijab: {t*1e3:8.2f} ms", flush=True)

print("PROBE G DONE", flush=True)
