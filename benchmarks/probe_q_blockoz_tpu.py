"""Probe Q: find the TPU-specific miscompile in the ozaki block ladder
(CPU is exact at every cutoff; the nP=219 solve went wrong on chip).

Run: python -u benchmarks/probe_q_blockoz_tpu.py > /tmp/probe_q.out 2>&1
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import pymes_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from pymes_tpu.models import ueg
from pymes_tpu.ops import ozaki
from pymes_tpu.ops.ueg_ladder import (build_block_ladder,
                                      block_ladder_apply_ij)
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

# 1) int8 batched dot_general on chip
rng = np.random.default_rng(0)
a8 = jnp.asarray(rng.integers(-63, 64, (4, 64, 64)), jnp.int8)
b8 = jnp.asarray(rng.integers(-63, 64, (4, 64, 49)), jnp.int8)
got = jax.vmap(lambda a, b: jax.lax.dot_general(
    a, b, (((1,), (0,)), ((), ())),
    preferred_element_type=jnp.int32))(a8, b8)
want = np.einsum("smk,skn->smn", np.asarray(a8, np.int64),
                 np.asarray(b8, np.int64))
print("int8 batched dot err:", np.abs(np.asarray(got, np.int64)
                                      - want).max(), flush=True)

# 2) vmapped ozaki matmul_presliced on chip vs numpy
A = rng.standard_normal((4, 64, 64)) * 1e-2
B = rng.standard_normal((4, 64, 49)) * 1e-2
sa, ea = jax.vmap(lambda x: ozaki.slice_rows(x, 9))(jnp.asarray(A))
sb, eb = jax.vmap(lambda x: ozaki.slice_cols(x, 9))(jnp.asarray(B))
got = jax.vmap(lambda s1, e1, s2, e2: ozaki.matmul_presliced(
    s1, e1, s2, e2, t_cutoff=16))(sa, ea, sb, eb)
want = np.einsum("smk,skn->smn", A, B)
print("vmapped ozaki matmul rel err:",
      np.abs(np.asarray(got) - want).max() / np.abs(want).max(),
      flush=True)

# 3) block ladder oz vs f64 on chip per cutoff
for cutoff in (5, 10, 14):
    u = ueg.UEG(14, 7, 7, 0.5)
    u.init_single_basis(cutoff)
    no = 7
    nv = u.n_spatial - no
    T = jnp.asarray(rng.standard_normal((no, no, nv, nv)) * 1e-2)
    bp_oz = build_block_ladder(u)
    bp_f64 = build_block_ladder(u, preslice=None)
    f_oz = jax.jit(lambda t, p=bp_oz: block_ladder_apply_ij(p, t))
    f_64 = jax.jit(lambda t, p=bp_f64: block_ladder_apply_ij(p, t))
    R1 = np.asarray(f_oz(T))
    R0 = np.asarray(f_64(T))
    print(f"cutoff={cutoff} nv={nv}: oz-vs-f64 on chip err = "
          f"{np.abs(R1-R0).max():.3e} (ref max {np.abs(R0).max():.3e})",
          flush=True)
print("PROBE Q DONE", flush=True)
