"""Probe B: the nP=123 ladder contraction, XLA-f64 vs Ozaki, on chip.

Shapes: V (13456, 13456) f64, T2 (13456, 49) f64 — the vvvv hot spot.
Run: python -u benchmarks/probe_b_ladder.py > /tmp/probe_b.out 2>&1
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import pymes_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from pymes_tpu.ops import ozaki

print("devices:", jax.devices(), flush=True)
M = K = 13456
N = 49


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


key = jax.random.PRNGKey(0)
make = jax.jit(lambda k, s: jax.random.normal(k, s, jnp.float32)
               .astype(jnp.float64), static_argnums=1)
V = make(key, (M, K))
T = make(key, (K, N))
jax.block_until_ready((V, T))
print("operands on device", flush=True)

t = timeit(jax.jit(lambda a, b: jnp.dot(a, b)), V, T)
print(f"xla f64 (M,K)x(K,N): {t*1e3:8.2f} ms", flush=True)
t = timeit(jax.jit(lambda a, b: jnp.dot(b.T, a.T)), V, T)
print(f"xla f64 transposed : {t*1e3:8.2f} ms", flush=True)
t = timeit(jax.jit(lambda a, b: jnp.dot(a.astype(jnp.float32),
                                        b.astype(jnp.float32))), V, T)
print(f"xla f32 (M,K)x(K,N): {t*1e3:8.2f} ms", flush=True)

for (S, T_cut) in ((7, 6), (9, 9)):
    f = jax.jit(lambda a, b: ozaki.matmul(a, b, n_slices=S, t_cutoff=T_cut))
    t = timeit(f, V, T)
    print(f"ozaki S{S} T{T_cut} (M,K)x(K,N): {t*1e3:8.2f} ms", flush=True)

# pre-sliced variant: slicing cost paid once
fslice = jax.jit(lambda a: ozaki.slice_rows(a, 7))
t = timeit(fslice, V)
print(f"slice_rows(V, 7)   : {t*1e3:8.2f} ms (one-time)", flush=True)
sa, ea = fslice(V)
fsliceT = jax.jit(lambda b: ozaki.slice_cols(b, 7))
t = timeit(fsliceT, T)
print(f"slice_cols(T2, 7)  : {t*1e3:8.2f} ms (per iter)", flush=True)
sb, eb = fsliceT(T)
fpre = jax.jit(lambda sa, ea, sb, eb: ozaki.matmul_presliced(
    sa, ea, sb, eb, t_cutoff=6))
t = timeit(fpre, sa, ea, sb, eb)
print(f"ozaki presliced T6 : {t*1e3:8.2f} ms (per iter)", flush=True)

print("PROBE B DONE", flush=True)
