"""Probe U: occupied-leading singles residual + small-output contraction
lowerings at nP=219 (follow-up to probe R: singles 32 ms of the 104 ms
full CCSD iteration).

Measures (1) singles_residual (abij temporaries) vs singles_residual_ij,
(2) ozaki vs mul+sum for the tiny-output big-K contractions the gate in
ops/contract.py currently sends to ozaki, (3) the full ccsd_iteration
after the ij-native singles + hoisted abij_t.

Run: python -u benchmarks/probe_u_singles.py > /tmp/probe_u.out 2>&1
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
from pymes_tpu.ops.contract import _mulsum
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj', 'aijb',
        'ijka', 'ijak', 'iajk')
cutoff = int(os.environ.get('U_CUTOFF', 14))
MODE = os.environ.get('U_MODE', 'ozaki:7:6')
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
dict_V["abij_t"] = jnp.transpose(d["abij"], (2, 3, 0, 1))
print(f"nP={n_p} mode={MODE}", flush=True)

rng = np.random.default_rng(0)
T1 = jnp.asarray(rng.standard_normal((nv, no)) * 1e-3)
T2_ij = jnp.asarray(rng.standard_normal((no, no, nv, nv)) * 1e-2)
D_ai = 1.0 / (eps_i[None, :] - eps_a[:, None] - 1.0)
D_ij = 1.0 / (eps_i[:, None, None, None] + eps_i[None, :, None, None]
              - eps_a[None, None, :, None] - eps_a[None, None, None, :]
              - 1.0)
jax.block_until_ready((T1, T2_ij))
fd = ccsd_mod.get_T1_dressed_fock(fock, T1, dict_V, no=no,
                                  contract_mode=MODE)
jax.block_until_ready(fd)


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
    print(f"{tag}: {(time.time()-t0)/n2*1e3:.2f} ms", flush=True)


# --- 1. singles: old (abij temporaries) vs ij-native ---
def singles_old(t1, t2):
    W = ladder_apply_ij(lad_all, t2)
    t2ab = jnp.transpose(t2, (2, 3, 0, 1))
    return ccsd_mod.singles_residual(fd, t1, t2ab, dict_V,
                                     contract_mode=MODE, ladder_W=W,
                                     ladder_w_layout="ijab")


def singles_ij(t1, t2):
    W = ladder_apply_ij(lad_all, t2)
    return ccsd_mod.singles_residual_ij(fd, t1, t2, dict_V,
                                        contract_mode=MODE, ladder_W=W)


timeit("singles OLD (abij tilde, incl. W)", singles_old)
timeit("singles IJ-native (incl. W)", singles_ij)

# --- 2. small-output big-K lowerings ---
Vijab = dict_V["ijab"]
tilde = 2.0 * T2_ij - jnp.transpose(T2_ij, (1, 0, 2, 3))
jax.block_until_ready(tilde)
for spec in ("kjbc,ijbc->ki", "jkcb,jkab->ca"):
    timeit(f"ozaki[{spec}]",
           lambda t1, t2, s=spec: ozaki.einsum2(s, Vijab, tilde,
                                                n_slices=7, t_cutoff=6))
    timeit(f"mulsum[{spec}]",
           lambda t1, t2, s=spec: _mulsum(s, Vijab, tilde))
    timeit(f"xla[{spec}]",
           lambda t1, t2, s=spec: jnp.einsum(s, Vijab, tilde))

# the klij-forming ring (tiny out, big K) and its skinny-K consumer
klij_like = dict_V["klij"]
timeit("ozaki[klcd,ijcd->klij]",
       lambda t1, t2: ozaki.einsum2("klcd,ijcd->klij", Vijab, t2,
                                    n_slices=7, t_cutoff=6))
timeit("mulsum[klcd,ijcd->klij]",
       lambda t1, t2: _mulsum("klcd,ijcd->klij", Vijab, t2))
timeit("xla[klij,klab->ijab] (K=49 skinny)",
       lambda t1, t2: jnp.einsum("klij,klab->ijab", klij_like, t2))
timeit("mulsum-ish matmul[klij,klab->ijab]",
       lambda t1, t2: (klij_like.reshape(no * no, no * no).T
                       @ t2.reshape(no * no, nv * nv)).reshape(
                           no, no, nv, nv))

# --- 3. dressed abij: natural + transpose vs out_perm corrections ---
def abij_old(t1, t2):
    v = ccsd_mod.dressed_block("abij", dict_V, t1,
                               skip_sources=("abcd",), contract_mode=MODE)
    return jnp.transpose(v, (2, 3, 0, 1))


def abij_new(t1, t2):
    corr = ccsd_mod.dressed_block("abij", dict_V, t1,
                                  skip_sources=("abcd",),
                                  contract_mode=MODE,
                                  out_perm=(2, 3, 0, 1), skip_identity=True)
    return dict_V["abij_t"] + corr


timeit("dressed abij OLD (natural+transpose)", abij_old)
timeit("dressed abij NEW (out_perm corrections)", abij_new)

# --- 4. full iteration ---
from pymes_tpu.mixer import diis
n_flat = nv * no + nv * nv * no * no
ds = diis.init_state(6, n_flat, jnp.float64)


def full_iter(t1, t2):
    out = ccsd_mod.ccsd_iteration(fock, dict_V, no, t1, t2, D_ai, D_ij,
                                  ds, jnp.zeros(()), ladder_all=lad_all,
                                  contract_mode=MODE, layout="ijab")
    return out[:2]


timeit("FULL ccsd_iteration (ij singles + hoisted abij_t)", full_iter)
print("PROBE U DONE", flush=True)
