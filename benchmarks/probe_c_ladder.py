"""Probe C: trustworthy on-chip timings via dependency-chained loops.

block_until_ready through the axon tunnel can return before execution
completes, so every measurement here runs the op N times inside a
lax.fori_loop with a data dependency between iterations and fetches a
scalar; cost = (t(2N) - t(N)) / N.

Run: python -u benchmarks/probe_c_ladder.py > /tmp/probe_c.out 2>&1
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

from pymes_tpu.ops import ozaki

print("devices:", jax.devices(), flush=True)
M = K = 13456
N = 49


def chain_time(make_body, n1=4, n2=12):
    """Measure per-iteration wall of a data-dependent op chain."""
    @partial(jax.jit, static_argnums=(0,))
    def run(n, *args):
        def body(i, acc):
            return make_body(acc, *args)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float64))

    def once(n, *args):
        t0 = time.perf_counter()
        v = float(run(n, *args))
        return time.perf_counter() - t0, v

    once(n1, *ARGS)  # warm compile both
    once(n2, *ARGS)
    t1, _ = once(n1, *ARGS)
    t2, _ = once(n2, *ARGS)
    return (t2 - t1) / (n2 - n1)


key = jax.random.PRNGKey(0)
make = jax.jit(lambda k, s: jax.random.normal(k, s, jnp.float32)
               .astype(jnp.float64), static_argnums=1)
V = make(key, (M, K))
T = make(jax.random.PRNGKey(1), (K, N))
jax.block_until_ready((V, T))
print("operands on device", flush=True)

# --- xla f64 ladder ---
ARGS = (V, T)
t = chain_time(lambda acc, a, b: acc + jnp.sum(
    jnp.dot(a, b * (1.0 + acc * 1e-300))) * 1e-300)
print(f"xla f64 ladder     : {t*1e3:8.2f} ms/op", flush=True)

# --- xla f32 ladder ---
V32, T32 = V.astype(jnp.float32), T.astype(jnp.float32)
ARGS = (V32, T32)
t = chain_time(lambda acc, a, b: acc + jnp.sum(
    jnp.dot(a, b * (1.0 + acc.astype(jnp.float32) * 1e-30))
).astype(jnp.float64) * 1e-300)
print(f"xla f32 ladder     : {t*1e3:8.2f} ms/op", flush=True)

# --- ozaki presliced, several tiers ---
for (S, Tc) in ((5, 4), (7, 6), (9, 9)):
    sa, ea = jax.jit(ozaki.slice_rows, static_argnums=1)(V, S)
    jax.block_until_ready(sa)

    def body(acc, sa, ea, b):
        sb, eb = ozaki.slice_cols(b * (1.0 + acc * 1e-300), S)
        out = ozaki.matmul_presliced(sa, ea, sb, eb, t_cutoff=Tc)
        return acc + jnp.sum(out) * 1e-300

    ARGS = (sa, ea, T)
    t = chain_time(body)
    print(f"ozaki S{S} T{Tc} preslicedV: {t*1e3:8.2f} ms/op "
          "(incl. per-iter T2 slice)", flush=True)

# --- per-iteration T2 slicing alone ---
def body_slice(acc, b):
    sb, eb = ozaki.slice_cols(b * (1.0 + acc * 1e-300), 7)
    return acc + jnp.sum(sb[0, 0].astype(jnp.float64)) * 1e-300 + \
        jnp.sum(eb).astype(jnp.float64) * 1e-300

ARGS = (T,)
t = chain_time(body_slice)
print(f"slice_cols(T2, 7)  : {t*1e3:8.2f} ms/op", flush=True)

# --- one-time V slicing ---
def body_sliceV(acc, a):
    sa, ea = ozaki.slice_rows(a * (1.0 + acc * 1e-300), 7)
    return acc + jnp.sum(sa[0, 0].astype(jnp.float64)) * 1e-300 + \
        jnp.sum(ea).astype(jnp.float64) * 1e-300

ARGS = (V,)
t = chain_time(body_sliceV, n1=2, n2=5)
print(f"slice_rows(V, 7)   : {t*1e3:8.2f} ms/op (one-time)", flush=True)

print("PROBE C DONE", flush=True)
