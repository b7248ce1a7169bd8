"""Probe K: per-component breakdown of the ij-layout residual at nP=123.

All operands are shipped as jit args (closed-over constants blow the
axon remote-compile request size).

Run: python -u benchmarks/probe_k_ij_breakdown.py > /tmp/probe_k.out 2>&1
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
from pymes_tpu.solver import ccd
from pymes_tpu.ops import ozaki
from pymes_tpu.ops.contract import contract
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'abcd')
u = ueg.UEG(14, 7, 7, 0.5)
u.init_single_basis(10)
no = 7
idx, vals = u.eval_2b_integrals(sp=2)
n_p = u.n_spatial
nv = n_p - no
d = ueg.sparse_to_blocks(idx, vals, n_p, no, names=NEED, dtype=jnp.float64)
blocks = ccd.blocks_from_dict(d)
Vij = ccd.blocks_ij_from(blocks)
rng = np.random.default_rng(0)
T_ab = jnp.asarray(rng.standard_normal((nv, nv, no, no)) * 1e-2)
T_ij = jnp.transpose(T_ab, (2, 3, 0, 1))
f_ab = jnp.asarray(np.diag(rng.uniform(1, 2, nv)))
f_ij = jnp.asarray(np.diag(rng.uniform(-2, -1, no)))
jax.block_until_ready((T_ab, T_ij, Vij.abij_t))
print(f"nP={n_p}", flush=True)

MODE = "ozaki:7:6"
pre_ab = ccd.preslice_abcd(blocks.abcd, 7, "abij")
pre_ij = ccd.preslice_abcd(blocks.abcd, 7, "ijab")
jax.block_until_ready((pre_ab[0], pre_ij[0]))


def timeit(tag, fn, *args, n1=3, n2=13):
    # fn(*args) with args[0] the dependency-carried operand
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


timeit("residual abij (ozaki:7:6)",
       lambda T, fa, fi, B, P: ccd.doubles_residual(
           fa, fi, T, B, contract_mode=MODE, abcd_presliced=P),
       T_ab, f_ab, f_ij, blocks, pre_ab)
timeit("residual ijab (ozaki:7:6)",
       lambda T, fa, fi, B, P: ccd.doubles_residual_ij(
           fa, fi, T, B, contract_mode=MODE, abcd_presliced=P),
       T_ij, f_ab, f_ij, Vij, pre_ij)


def lad_ab(T, sa, ea):
    sb, eb = ozaki.slice_cols(T.reshape(nv * nv, no * no), 7)
    return ozaki.matmul_presliced(sa, ea, sb, eb,
                                  t_cutoff=6).reshape(nv, nv, no, no)


def lad_ij(T, sb, eb):
    sa, ea = ozaki.slice_rows(T.reshape(no * no, nv * nv), 7)
    return ozaki.matmul_presliced(sa, ea, sb, eb,
                                  t_cutoff=6).reshape(no, no, nv, nv)


def lad_ij_viaT(T, sa, ea):
    # C^T trick: (t @ V^T) = (V @ t^T)^T — reuse the abij-orientation
    # presliced V rows, transpose only the small operands
    t2 = T.reshape(no * no, nv * nv).T
    sb, eb = ozaki.slice_cols(t2, 7)
    W = ozaki.matmul_presliced(sa, ea, sb, eb, t_cutoff=6)
    return W.reshape(nv, nv, no, no).transpose(2, 3, 0, 1)


timeit("ladder abij (V-rows presliced)", lad_ab, T_ab, *pre_ab)
timeit("ladder ijab (V^T-cols presliced)", lad_ij, T_ij, *pre_ij)
timeit("ladder ijab via C^T (V-rows presliced)", lad_ij_viaT, T_ij, *pre_ab)

for spec in ("klcd,ijcd->klij", "klcd,kjad->ljac", "klcd,ljdb->kjcb",
             "ikac,kjcb->ijab", "klad,lkdc->ac", "lica,ljcb->ijab",
             "lica,ljbc->ijab", "ikbc,kjac->ijab"):
    timeit(f"c2 {spec}",
           lambda A, B, s=spec: contract(s, A, B, mode=MODE), T_ij, Vij.ijab
           if spec.split(",")[0] in ("klcd",) else T_ij)

timeit("tilde (ij layout)",
       lambda T: 2.0 * T - jnp.transpose(T, (0, 1, 3, 2)), T_ij)
timeit("P(ab,ij) transpose (ij)",
       lambda T: T + jnp.transpose(T, (1, 0, 3, 2)), T_ij)
timeit("tilde (abij layout)",
       lambda T: 2.0 * T - jnp.transpose(T, (1, 0, 2, 3)), T_ab)
timeit("P transpose (abij)",
       lambda T: T + jnp.transpose(T, (1, 0, 3, 2)), T_ab)

# preslice costs (once per solve call when not hoisted)
V2 = blocks.abcd.reshape(nv * nv, nv * nv)
timeit("slice_rows(V) x7", lambda V: ozaki.slice_rows(V, 7)[0]
       .sum(dtype=jnp.float64), V2, n1=1, n2=4)
timeit("V.T (f64)", lambda V: jnp.transpose(V), V2, n1=1, n2=4)
timeit("slice_cols(V.T) x7", lambda V: ozaki.slice_cols(
    jnp.transpose(V), 7)[0].sum(dtype=jnp.float64), V2, n1=1, n2=4)
print("PROBE K DONE", flush=True)
