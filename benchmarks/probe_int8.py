"""On-chip probes for the Ozaki-split f64 matmul design (round 2).

Questions answered on the real v5e:
  1. int8 x int8 -> int32 dot_general: does it hit the MXU, at what rate?
  2. emulated-f64 frexp / ldexp / trunc: supported and exact?
  3. where the nP=123 f64 CCD iteration's 206 ms actually goes, op by op.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import pymes_tpu  # noqa: F401  (enables x64 + compile cache)
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


# ---- 1. dtype matmul ladder at a square shape and the CC ladder shape ----
key = jax.random.PRNGKey(0)
for (m, k, n) in ((4096, 4096, 4096), (13312, 13312, 128)):
    a32 = jax.random.normal(key, (m, k), dtype=jnp.float32)
    b32 = jax.random.normal(key, (k, n), dtype=jnp.float32)
    flops = 2.0 * m * k * n
    rows = []
    for tag, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32),
                    ("f64", jnp.float64)):
        f = jax.jit(lambda x, y: jnp.dot(x, y))
        try:
            t = timeit(f, a32.astype(dt), b32.astype(dt))
            rows.append(f"{tag} {t*1e3:8.2f} ms {flops/t/1e12:7.2f} TF/s")
        except Exception as e:  # noqa: BLE001
            rows.append(f"{tag} FAILED {type(e).__name__}")
    fi8 = jax.jit(lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
    a8 = (a32 * 10).astype(jnp.int8)
    b8 = (b32 * 10).astype(jnp.int8)
    try:
        t = timeit(fi8, a8, b8)
        rows.append(f"int8->int32 {t*1e3:8.2f} ms {flops/t/1e12:7.2f} TOP/s")
    except Exception as e:  # noqa: BLE001
        rows.append(f"int8 FAILED {type(e).__name__}: {e}")
    print(f"shape ({m},{k})x({k},{n}):", flush=True)
    for r in rows:
        print("   ", r, flush=True)

# ---- 2. f64 frexp/ldexp/trunc support ----
x = jnp.asarray(np.array([3.7e-12, -1.0, 0.0, 123456.789, 2.0**-1030],
                         dtype=np.float64))
try:
    mant, ex = jax.jit(jnp.frexp)(x)
    mant_np, ex_np = np.frexp(np.asarray(x))
    ok = np.allclose(np.asarray(mant), mant_np) and np.array_equal(
        np.asarray(ex), ex_np)
    print("frexp f64:", "OK" if ok else
          f"MISMATCH got {np.asarray(mant)},{np.asarray(ex)}", flush=True)
except Exception as e:  # noqa: BLE001
    print("frexp f64 FAILED:", type(e).__name__, e, flush=True)
try:
    y = jax.jit(jnp.ldexp)(jnp.ones(5, jnp.float64), jnp.arange(-2, 3))
    ok = np.array_equal(np.asarray(y), 2.0 ** np.arange(-2, 3))
    print("ldexp f64:", "OK" if ok else f"MISMATCH {np.asarray(y)}",
          flush=True)
except Exception as e:  # noqa: BLE001
    print("ldexp f64 FAILED:", type(e).__name__, e, flush=True)
try:
    z = jax.jit(jnp.trunc)(jnp.asarray([1.9, -1.9, 63.999], jnp.float64))
    print("trunc f64:", "OK" if np.array_equal(np.asarray(z), [1., -1., 63.])
          else f"MISMATCH {np.asarray(z)}", flush=True)
except Exception as e:  # noqa: BLE001
    print("trunc f64 FAILED:", type(e).__name__, e, flush=True)

# ---- 3. nP=123 f64 residual, op-by-op ----
no, nv = 7, 116
kT = jax.random.PRNGKey(1)
T = jax.random.normal(kT, (nv, nv, no, no), jnp.float64) * 0.01
Vijab = jax.random.normal(kT, (no, no, nv, nv), jnp.float64)
Viajb = jax.random.normal(kT, (no, nv, no, nv), jnp.float64)
Viabj = jax.random.normal(kT, (no, nv, nv, no), jnp.float64)
Vklij = jax.random.normal(kT, (no, no, no, no), jnp.float64)
Vabcd = jax.random.normal(kT, (nv, nv, nv, nv), jnp.float64)

ops = {
    "ladder abcd,cdij": lambda: jnp.einsum("abcd,cdij->abij", Vabcd, T),
    "hh klcd,cdij": lambda: jnp.einsum("klcd,cdij->klij", Vijab, T),
    "klij,abkl": lambda: jnp.einsum("klij,abkl->abij", Vklij, T),
    "X_alcj": lambda: jnp.einsum("klcd,adkj->alcj", Vijab, T),
    "alcj,cbil": lambda: jnp.einsum(
        "alcj,cbil->abij",
        jnp.zeros((nv, no, nv, no), jnp.float64), T),
    "quad ring pair": lambda: jnp.einsum(
        "acik,cbkj->abij", T, jnp.einsum("klcd,dblj->cbkj", Vijab, T)),
    "rings iajb x2": lambda: (jnp.einsum("kaic,cbkj->abij", Viajb, T)
                              + jnp.einsum("acik,kbcj->abij", T, Viabj)),
    "tilde_T + P(ab,ij)": lambda: (2.0 * T - jnp.einsum("baij->abij", T)
                                   + jnp.einsum("abij->baji", T)),
    "jacobi divide": lambda: T / (T + 0.5),
}
for name, fn in ops.items():
    f = jax.jit(fn)
    t = timeit(f, n=3)
    print(f"op {name:22s} {t*1e3:8.2f} ms", flush=True)

print("PROBE DONE", flush=True)
