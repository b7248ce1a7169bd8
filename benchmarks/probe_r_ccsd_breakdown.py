"""Probe R: per-component timing of the matrix-free CCSD iteration at
nP=219 (VERDICT r2 task 4: mf-CCSD 150 ms/iter -> target <= 60).

Times each piece of ccsd_iteration separately (ij layout, block plan,
ozaki contractions) to locate the remaining cost.

Run: python -u benchmarks/probe_r_ccsd_breakdown.py > /tmp/probe_r.out 2>&1
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
from pymes_tpu.mean_field import hf
from pymes_tpu.solver import ccd as ccd_mod
from pymes_tpu.solver import ccsd as ccsd_mod
from pymes_tpu.ops.ueg_ladder import (build_block_ladder, build_ovvv_plans,
                                      ladder_apply_ij)
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj', 'aijb',
        'ijka', 'ijak', 'iajk')
cutoff = int(os.environ.get('R_CUTOFF', 14))
MODE = os.environ.get('R_MODE', 'ozaki:7:6')
u = ueg.UEG(14, 7, 7, 0.5)
u.init_single_basis(cutoff)
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
print(f"nP={n_p} mode={MODE}", flush=True)

rng = np.random.default_rng(0)
T1 = jnp.asarray(rng.standard_normal((nv, no)) * 1e-3)
T2_ij = jnp.asarray(rng.standard_normal((no, no, nv, nv)) * 1e-2)
D_ai = 1.0 / (eps_i[None, :] - eps_a[:, None] - 1.0)
D_ij = 1.0 / (eps_i[:, None, None, None] + eps_i[None, :, None, None]
              - eps_a[None, None, :, None] - eps_a[None, None, None, :]
              - 1.0)
jax.block_until_ready((T1, T2_ij))


def timeit(tag, make_fn, n1=2, n2=10):
    fn = jax.jit(make_fn)
    out = fn(T1, T2_ij)
    jax.block_until_ready(out)
    for _ in range(n1):
        jax.block_until_ready(fn(T1, T2_ij))
    t0 = time.time()
    for _ in range(n2):
        out = fn(T1, T2_ij)
    jax.block_until_ready(out)
    print(f"{tag}: {(time.time()-t0)/n2*1e3:.1f} ms", flush=True)


# 1. all-bra ladder W
timeit("ladder_W (all-bra, int8 sectors)",
       lambda t1, t2: ladder_apply_ij(lad_all, t2))

# 2. dressed fock
timeit("dressed fock",
       lambda t1, t2: ccsd_mod.get_T1_dressed_fock(
           fock, t1, dict_V, no=no, contract_mode=MODE))

# 3. dressed small blocks
keys = tuple(k for k in ccsd_mod.DOUBLES_DRESSED if k != "abcd")


def dress_blocks(t1, t2):
    return {k: ccsd_mod.dressed_block(k, dict_V, t1,
                                      skip_sources=("abcd",)
                                      if k == "abij" else (),
                                      contract_mode=MODE)
            for k in keys}


timeit("dressed V blocks", dress_blocks)

# 4. doubles residual (full, including ladder via blocks_ij)
fd = ccsd_mod.get_T1_dressed_fock(fock, T1, dict_V, no=no,
                                  contract_mode=MODE)
jax.block_until_ready(fd)


def doubles_res(t1, t2):
    W = ladder_apply_ij(lad_all, t2)
    Vd = dress_blocks(t1, t2)
    X = jnp.einsum("ci,dj->ijcd", t1, t1)
    abij_t = (jnp.transpose(Vd["abij"], (2, 3, 0, 1))
              + ladder_apply_ij(lad_all, X)[:, :, no:, no:])
    blocks_ij = ccd_mod.CCDBlocksIJ(
        klij=Vd["klij"], ijab=Vd["ijab"], ijab_x=None, abij_t=abij_t,
        ikac=jnp.transpose(Vd["iajb"], (2, 0, 1, 3)),
        kjcb=jnp.transpose(Vd["iabj"], (0, 3, 2, 1)),
        abcd=None, ladder=lad_all, ladder_W=W)
    return ccd_mod.doubles_residual_ij(fd[no:, no:], fd[:no, :no], t2,
                                       blocks_ij, t_T_ai=t1,
                                       contract_mode=MODE)


timeit("doubles residual (dress+ladder+rings)", doubles_res)

# 5. singles residual
def singles_res(t1, t2):
    W = ladder_apply_ij(lad_all, t2)
    t2ab = jnp.transpose(t2, (2, 3, 0, 1))
    return ccsd_mod.singles_residual(fd, t1, t2ab, dict_V,
                                     contract_mode=MODE, ladder_W=W,
                                     ladder_w_layout="ijab")


timeit("singles residual (incl. its own W)", singles_res)

# 6. one full iteration
from pymes_tpu.mixer import diis
n_flat = nv * no + nv * nv * no * no
ds = diis.init_state(6, n_flat, jnp.float64)


def full_iter(t1, t2):
    out = ccsd_mod.ccsd_iteration(fock, dict_V, no, t1, t2, D_ai, D_ij,
                                  ds, jnp.zeros(()), ladder_all=lad_all,
                                  contract_mode=MODE, layout="ijab")
    return out[:2]


timeit("FULL ccsd_iteration", full_iter, n1=2, n2=10)
print("PROBE R DONE", flush=True)
