"""Probe T: fine-grained timing of the T1 dressing at nP=219 (the mf-CCSD
wall per probe R: fock 34 ms + V blocks 40 ms vs ladder 10 ms).

Times each dressing sub-piece in both contract modes to locate whether the
cost is ozaki slicing overhead at marginal sizes, emulated-f64 einsums, or
the ovvv gather plans.

Run: python -u benchmarks/probe_t_dressing.py > /tmp/probe_t.out 2>&1
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import pymes_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from pymes_tpu.models import ueg
from pymes_tpu.mean_field import hf
from pymes_tpu.solver import ccsd as ccsd_mod
from pymes_tpu.ops.ueg_ladder import build_ovvv_plans, ovvv_t1_apply
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj', 'aijb',
        'ijka', 'ijak', 'iajk')
cutoff = int(os.environ.get('T_CUTOFF', 14))
u = ueg.UEG(14, 7, 7, 0.5)
u.init_single_basis(cutoff)
no, n_p = 7, u.n_spatial
nv = n_p - no
idx, vals = u.eval_2b_integrals(sp=2)
d = ueg.sparse_to_blocks(idx, vals, n_p, no, names=NEED, dtype=jnp.float64)
plans = build_ovvv_plans(u)
kin = jnp.asarray(u.kinetic_energies())
eps_i = hf.calcOccupiedOrbE(kin, d['klij'], no)
eps_a = hf.calcVirtualOrbE(kin, d['aibj'], d['aijb'], no, nv)
fock = jnp.diag(jnp.concatenate([eps_i, eps_a]))
dict_V = {k: v for k, v in d.items()}
dict_V["_ovvv_plans"] = plans
print(f"nP={n_p}", flush=True)

rng = np.random.default_rng(0)
T1 = jnp.asarray(rng.standard_normal((nv, no)) * 1e-3)
jax.block_until_ready(T1)


def timeit(tag, fn, n=20):
    f = jax.jit(fn)
    jax.block_until_ready(f(T1))
    jax.block_until_ready(f(T1))
    t0 = time.time()
    out = None
    for _ in range(n):
        out = f(T1)
    jax.block_until_ready(out)
    print(f"{tag}: {(time.time()-t0)/n*1e3:.2f} ms", flush=True)


# --- ovvv gather plans alone (trailing-j vs occupied-leading) ---
from pymes_tpu.ops.ueg_ladder import ovvv_t1_apply_j
for pat in ("vvo", "ovv", "vov"):
    timeit(f"ovvv_t1_apply[{pat}]",
           lambda t, p=pat: ovvv_t1_apply(plans[p], t))
    timeit(f"ovvv_t1_apply_j[{pat}]",
           lambda t, p=pat: ovvv_t1_apply_j(plans[p], t))

# --- dressed fock, whole and by mode ---
for mode in ("xla", "ozaki:7:6"):
    timeit(f"dressed fock [{mode}]",
           lambda t, m=mode: ccsd_mod.get_T1_dressed_fock(
               fock, t, dict_V, no=no, contract_mode=m))

# --- dressed fock G pieces ---
timeit("fock G_oo", lambda t: (
    2.0 * jnp.einsum("ck,ikjc->ij", t, dict_V["ijka"])
    - jnp.einsum("ck,ikcj->ij", t, dict_V["ijak"])))
timeit("fock G_vv (2 ovvv gathers + traces)", lambda t: (
    2.0 * jnp.einsum("ajbj->ab", ovvv_t1_apply(plans["vov"], t))
    - jnp.einsum("jabj->ab", ovvv_t1_apply(plans["ovv"], t))))
timeit("fock G_vo+G_ov", lambda t: (
    2.0 * jnp.einsum("bj,ajib->ai", t, dict_V["aijb"])
    - jnp.einsum("bj,ajbi->ai", t, dict_V["aibj"]),
    2.0 * jnp.einsum("ck,ikbc->ib", t, dict_V["ijab"])
    - jnp.einsum("ck,ikcb->ib", t, dict_V["ijab"]),
    2.0 * jnp.einsum("bj,jabi->ia", t, dict_V["iabj"])
    - jnp.einsum("bj,jiab->ia", t, dict_V["ijab"])))

# skinny-contraction pathology check: the same matvec as einsum vs mul+sum
timeit("skinny einsum bj,ajib->ai",
       lambda t: jnp.einsum("bj,ajib->ai", t, dict_V["aijb"]))
timeit("skinny mul+sum bj,ajib->ai",
       lambda t: (dict_V["aijb"]
                  * t.T[None, :, None, :]).sum(axis=(1, 3)))
timeit("skinny einsum ak,kbij->abij (K=7)",
       lambda t: jnp.einsum("ak,kbij->abij", t, dict_V["iajk"]))
timeit("skinny mul+sum ak,kbij->abij (K=7)",
       lambda t: (t[:, :, None, None, None]
                  * dict_V["iajk"][None]).sum(axis=1))

# --- each dressed V block, both modes ---
keys = tuple(k for k in ccsd_mod.DOUBLES_DRESSED if k != "abcd")
for mode in ("xla", "ozaki:7:6"):
    for k in keys:
        timeit(f"dressed_block[{k}] [{mode}]",
               lambda t, kk=k, m=mode: ccsd_mod.dressed_block(
                   kk, dict_V, t,
                   skip_sources=("abcd",) if kk == "abij" else (),
                   contract_mode=m))
    timeit(f"ALL dressed blocks [{mode}]",
           lambda t, m=mode: {k: ccsd_mod.dressed_block(
               k, dict_V, t,
               skip_sources=("abcd",) if k == "abij" else (),
               contract_mode=m) for k in keys})

print("PROBE T DONE", flush=True)
