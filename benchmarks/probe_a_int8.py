"""Probe A: int8 MXU rate + f64 frexp/ldexp/trunc support (lean, <3 min).

Run: python -u benchmarks/probe_a_int8.py > /tmp/probe_a.out 2>&1
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import pymes_tpu  # noqa: F401
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


# f64 support probes first (tiny, fast)
x = jnp.asarray(np.array([3.7e-12, -1.0, 0.0, 123456.789], dtype=np.float64))
try:
    mant, ex = jax.jit(jnp.frexp)(x)
    mant_np, ex_np = np.frexp(np.asarray(x))
    print("frexp f64:", "OK" if (np.allclose(np.asarray(mant), mant_np)
                                 and np.array_equal(np.asarray(ex), ex_np))
          else f"MISMATCH {np.asarray(mant)} {np.asarray(ex)}", flush=True)
except Exception as e:  # noqa: BLE001
    print("frexp f64 FAILED:", type(e).__name__, e, flush=True)
try:
    y = jax.jit(jnp.ldexp)(jnp.ones(5, jnp.float64),
                           jnp.arange(-2, 3, dtype=jnp.int32))
    print("ldexp f64:", "OK" if np.array_equal(np.asarray(y),
                                               2.0 ** np.arange(-2, 3))
          else f"MISMATCH {np.asarray(y)}", flush=True)
except Exception as e:  # noqa: BLE001
    print("ldexp f64 FAILED:", type(e).__name__, e, flush=True)
try:
    z = jax.jit(jnp.trunc)(jnp.asarray([1.9, -1.9, 63.999], jnp.float64))
    print("trunc f64:", "OK" if np.array_equal(np.asarray(z), [1., -1., 63.])
          else f"MISMATCH {np.asarray(z)}", flush=True)
except Exception as e:  # noqa: BLE001
    print("trunc f64 FAILED:", type(e).__name__, e, flush=True)

# int8 / bf16 / f32 matmul rates (square + ladder-skew shapes)
key = jax.random.PRNGKey(0)
for (m, k, n) in ((4096, 4096, 4096), (13312, 13312, 128)):
    a32 = jax.random.normal(key, (m, k), dtype=jnp.float32)
    b32 = jax.random.normal(key, (k, n), dtype=jnp.float32)
    flops = 2.0 * m * k * n
    for tag, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        f = jax.jit(lambda x, y: jnp.dot(x, y))
        t = timeit(f, a32.astype(dt), b32.astype(dt))
        print(f"({m},{k},{n}) {tag}: {t*1e3:8.2f} ms {flops/t/1e12:7.2f} "
              "TF/s", flush=True)
    fi8 = jax.jit(lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
    a8 = (a32 * 10).astype(jnp.int8)
    b8 = (b32 * 10).astype(jnp.int8)
    try:
        t = timeit(fi8, a8, b8)
        print(f"({m},{k},{n}) int8->int32: {t*1e3:8.2f} ms "
              f"{flops/t/1e12:7.2f} TOP/s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"({m},{k},{n}) int8 FAILED: {type(e).__name__}: {e}",
              flush=True)

print("PROBE A DONE", flush=True)
