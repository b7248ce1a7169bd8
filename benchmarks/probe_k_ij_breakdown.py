"""Probe K: per-component breakdown of the ij-layout residual at nP=123.

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
pre_ab = ozaki.slice_rows(blocks.abcd.reshape(nv * nv, nv * nv), 7)
pre_ij = ozaki.slice_cols(blocks.abcd.reshape(nv * nv, nv * nv).T, 7)
jax.block_until_ready((pre_ab[0], pre_ij[0]))


def timeit(tag, fn, *args, n1=3, n2=13):
    @partial(jax.jit, static_argnums=0)
    def run(n, *a):
        def body(i, acc):
            x = fn(*((a[0] * (1.0 + acc * 1e-300),) + a[1:]))
            return acc + jnp.sum(x) * 1e-300
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float64))

    float(run(n1, *args)); float(run(n2, *args))
    t0 = time.perf_counter(); float(run(n1, *args))
    t1 = time.perf_counter(); float(run(n2, *args))
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / (n2 - n1)
    print(f"{tag:42s}: {dt*1e3:8.2f} ms", flush=True)
    return dt


# full residuals
timeit("residual abij (ozaki:7:6)",
       lambda T: ccd.doubles_residual(f_ab, f_ij, T, blocks,
                                      contract_mode=MODE,
                                      abcd_presliced=pre_ab), T_ab)
timeit("residual ijab (ozaki:7:6)",
       lambda T: ccd.doubles_residual_ij(f_ab, f_ij, T, Vij,
                                         contract_mode=MODE,
                                         abcd_presliced=pre_ij), T_ij)

# ladder alone, both orientations
def lad_ab(T):
    sb, eb = ozaki.slice_cols(T.reshape(nv * nv, no * no), 7)
    W = ozaki.matmul_presliced(pre_ab[0], pre_ab[1], sb, eb, t_cutoff=6)
    return W.reshape(nv, nv, no, no)


def lad_ij(T):
    sa, ea = ozaki.slice_rows(T.reshape(no * no, nv * nv), 7)
    W = ozaki.matmul_presliced(sa, ea, pre_ij[0], pre_ij[1], t_cutoff=6)
    return W.reshape(no, no, nv, nv)


timeit("ladder abij (V-rows presliced)", lad_ab, T_ab)
timeit("ladder ijab (V^T-cols presliced)", lad_ij, T_ij)

# individual ij einsums
for spec, aa, bb in (
        ("klcd,ijcd->klij", Vij.ijab, T_ij),
        ("klij,klab->ijab", None, T_ij),
        ("klcd,kjad->ljac", Vij.ijab, T_ij),
        ("ljac,ilcb->ijab", None, T_ij),
        ("klcd,ljdb->kjcb", Vij.ijab, T_ij),
        ("ikac,kjcb->ijab", T_ij, T_ij),
        ("klad,lkdc->ac", T_ij, Vij.ijab),
        ("ac,ijcb->ijab", f_ab, T_ij),
        ("ki,kjab->ijab", f_ij, T_ij),
        ("ikac,kjcb->ijab(V)", Vij.ikac, T_ij),
        ("ikbc,kjac->ijab", Vij.ikac, T_ij),
        ("lica,ljcb->ijab", T_ij, T_ij),
        ("lica,ljbc->ijab", T_ij, T_ij),
):
    s = spec.replace("(V)", "")
    if aa is None:
        aa = jnp.asarray(rng.standard_normal(
            [dict(zip("ijklabcd", [no]*4+[nv]*4))[c]
             for c in s.split(",")[0]]))
    timeit(f"c2 {spec}", lambda A, B, s=s: contract(s, A, B, mode=MODE),
           aa, bb)

# preslice costs (these run once per solve call, inside the jit)
V2 = blocks.abcd.reshape(nv * nv, nv * nv)
timeit("slice_rows(V) x7", lambda V: ozaki.slice_rows(V, 7)[0]
       .sum(dtype=jnp.float64), V2, n1=1, n2=4)
timeit("V.T (f64)", lambda V: jnp.transpose(V), V2, n1=1, n2=4)
timeit("slice_cols(V.T) x7", lambda V: ozaki.slice_cols(
    jnp.transpose(V), 7)[0].sum(dtype=jnp.float64), V2, n1=1, n2=4)

# elementwise + transposes in ij layout
timeit("tilde (ij layout)",
       lambda T: 2.0 * T - jnp.transpose(T, (0, 1, 3, 2)), T_ij)
timeit("P(ab,ij) transpose (ij)",
       lambda T: T + jnp.transpose(T, (1, 0, 3, 2)), T_ij)
print("PROBE K DONE", flush=True)
