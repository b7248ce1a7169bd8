"""Probe V: CCD/CCSD ring contractions at nP=219 after the ozaki
diagonal-concat + grouped-transpose changes (follow-up to probe U: the
~35 ms of rings is the biggest remaining slice of the 84 ms iteration).

Run: python -u benchmarks/probe_v_rings.py > /tmp/probe_v.out 2>&1
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
from pymes_tpu.ops.ueg_ladder import (build_block_ladder, build_ovvv_plans,
                                      ladder_apply_ij)
from pymes_tpu.ops import ozaki
from pymes_tpu.ops.contract import contract
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj', 'aijb',
        'ijka', 'ijak', 'iajk')
MODE = os.environ.get('V_MODE', 'ozaki:7:6')
u = ueg.UEG(14, 7, 7, 0.5)
u.init_single_basis(14)
no, n_p = 7, u.n_spatial
nv = n_p - no
idx, vals = u.eval_2b_integrals(sp=2)
lad_all = build_block_ladder(u, bra="all")
plans = build_ovvv_plans(u)
d = ueg.sparse_to_blocks(idx, vals, n_p, no, names=NEED, dtype=jnp.float64)
kin = jnp.asarray(u.kinetic_energies())
eps_i = hf.calcOccupiedOrbE(kin, d['klij'], no)
eps_a = hf.calcVirtualOrbE(kin, d['aibj'], d['aijb'], no, nv)
fock = jnp.diag(jnp.concatenate([eps_i, eps_a]))
dict_V = {k: v for k, v in d.items()}
dict_V["_ovvv_plans"] = plans
dict_V["abij_t"] = jnp.transpose(d["abij"], (2, 3, 0, 1))
print(f"nP={n_p} mode={MODE}", flush=True)

rng = np.random.default_rng(0)
T1 = jnp.asarray(rng.standard_normal((nv, no)) * 1e-3)
T2 = jnp.asarray(rng.standard_normal((no, no, nv, nv)) * 1e-2)
Vijab = dict_V["ijab"]
klij = dict_V["klij"]
ikac = jnp.transpose(dict_V["iajb"], (2, 0, 1, 3))
kjcb = jnp.transpose(dict_V["iabj"], (0, 3, 2, 1))
jax.block_until_ready((T1, T2, ikac, kjcb))


def timeit(tag, make_fn, n1=2, n2=10):
    fn = jax.jit(make_fn)
    out = fn(T1, T2)
    jax.block_until_ready(out)
    for _ in range(n1):
        jax.block_until_ready(fn(T1, T2))
    t0 = time.time()
    for _ in range(n2):
        out = fn(T1, T2)
    jax.block_until_ready(out)
    print(f"{tag}: {(time.time()-t0)/n2*1e3:.2f} ms", flush=True)


c2 = lambda s, x, y: contract(s, x, y, mode=MODE)

# --- individual ring groups (as in doubles_residual_ij) ---
timeit("klij ring (klcd,ijcd->klij + klij,klab->ijab)",
       lambda t1, t: c2("klij,klab->ijab",
                        klij + c2("klcd,ijcd->klij", Vijab, t), t))
timeit("X_ljac pair (2 GEMMs)",
       lambda t1, t: c2("ljac,ilcb->ijab",
                        c2("klcd,kjad->ljac", Vijab, t), t))


def quad_ring(t1, t):
    tilde = 2.0 * t - jnp.transpose(t, (0, 1, 3, 2))
    return c2("ikac,kjcb->ijab", tilde,
              c2("klcd,ljdb->kjcb", Vijab, tilde))


timeit("quadratic ring (2 GEMMs + tilde)", quad_ring)


def ex_terms(t1, t):
    tilde = 2.0 * t - jnp.transpose(t, (0, 1, 3, 2))
    X_ac = -1.0 * c2("klad,lkdc->ac", tilde, Vijab)
    X_ki = c2("ilcd,lkdc->ki", tilde, Vijab)
    Ex = c2("ac,ijcb->ijab", X_ac, t)
    Ex = Ex - c2("ki,kjab->ijab", X_ki, t)
    Ex = Ex - c2("ikac,kjcb->ijab", ikac, t)
    Ex = Ex - c2("ikbc,kjac->ijab", ikac, t)
    Ex = Ex + c2("ikac,kjcb->ijab", tilde, kjcb)
    return Ex + jnp.transpose(Ex, (1, 0, 3, 2))


timeit("Ex block (5 GEMMs + X_ac/X_ki)", ex_terms)


def lica_terms(t1, t):
    X_lica = c2("klcd,kida->lica", Vijab, t)
    return (c2("lica,ljbc->ijab", X_lica, t)
            - c2("lica,ljcb->ijab", X_lica, t))


timeit("X_lica triple (3 GEMMs)", lica_terms)

# --- ozaki matmul microbench: ring-GEMM shape ---
A = jnp.asarray(rng.standard_normal((no * nv, no * nv)))
B = jnp.asarray(rng.standard_normal((no * nv, no * nv)))
jax.block_until_ready((A, B))
timeit("ozaki matmul 1484^3 (7:6, diag-concat)",
       lambda t1, t: ozaki.matmul(A, B, n_slices=7, t_cutoff=6))
timeit("ozaki matmul 1484^3 (6:5)",
       lambda t1, t: ozaki.matmul(A, B, n_slices=6, t_cutoff=5))
timeit("slice_rows 1484^2 (7 slices)",
       lambda t1, t: ozaki.slice_rows(A, 7))
timeit("xla f64 matmul 1484^3",
       lambda t1, t: A @ B)

# --- dressed abij with the single-final-transpose out_perm ---
def abij_new2(t1, t):
    corr = ccsd_mod.dressed_block("abij", dict_V, t1,
                                  skip_sources=("abcd",),
                                  contract_mode=MODE,
                                  out_perm=(2, 3, 0, 1), skip_identity=True)
    return dict_V["abij_t"] + corr


timeit("dressed abij NEW2 (single final transpose)", abij_new2)

# --- full iteration ---
from pymes_tpu.mixer import diis
D_ai = 1.0 / (eps_i[None, :] - eps_a[:, None] - 1.0)
D_ij = 1.0 / (eps_i[:, None, None, None] + eps_i[None, :, None, None]
              - eps_a[None, None, :, None] - eps_a[None, None, None, :]
              - 1.0)
n_flat = nv * no + nv * nv * no * no
ds = diis.init_state(6, n_flat, jnp.float64)


def full_iter(t1, t2):
    out = ccsd_mod.ccsd_iteration(fock, dict_V, no, t1, t2, D_ai, D_ij,
                                  ds, jnp.zeros(()), ladder_all=lad_all,
                                  contract_mode=MODE, layout="ijab")
    return out[:2]


timeit("FULL ccsd_iteration", full_iter)
print("PROBE V DONE", flush=True)
