"""Probe W: shared-slice ring engine at nP=219 (follow-up to probe V:
per-contraction slicing cost ~as much as the GEMMs; now V blocks are
sliced once per solve/iteration and T/tilde once per residual).

Run: python -u benchmarks/probe_w_sliced.py > /tmp/probe_w.out 2>&1
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
from pymes_tpu.solver import ccd as ccd_mod
from pymes_tpu.solver import ccsd as ccsd_mod
from pymes_tpu.ops.ueg_ladder import build_block_ladder, build_ovvv_plans
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj', 'aijb',
        'ijka', 'ijak', 'iajk')
u = ueg.UEG(14, 7, 7, 0.5)
u.init_single_basis(14)
no, n_p = 7, u.n_spatial
nv = n_p - no
idx, vals = u.eval_2b_integrals(sp=2)
lad_all = build_block_ladder(u, bra="all")
lad = build_block_ladder(u)
plans = build_ovvv_plans(u)
d = ueg.sparse_to_blocks(idx, vals, n_p, no, names=NEED, dtype=jnp.float64)
kin = jnp.asarray(u.kinetic_energies())
eps_i = hf.calcOccupiedOrbE(kin, d['klij'], no)
eps_a = hf.calcVirtualOrbE(kin, d['aibj'], d['aijb'], no, nv)
fock = jnp.diag(jnp.concatenate([eps_i, eps_a]))
dict_V = {k: v for k, v in d.items()}
dict_V["_ovvv_plans"] = plans
dict_V["abij_t"] = jnp.transpose(d["abij"], (2, 3, 0, 1))
print(f"nP={n_p}", flush=True)

rng = np.random.default_rng(0)
T1 = jnp.asarray(rng.standard_normal((nv, no)) * 1e-3)
T2 = jnp.asarray(rng.standard_normal((no, no, nv, nv)) * 1e-2)
jax.block_until_ready((T1, T2))


def timeit(tag, make_fn, args, n1=2, n2=10):
    fn = jax.jit(make_fn)
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"  [{tag} compile {time.time()-t0:.1f}s]", flush=True)
    for _ in range(n1):
        jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n2):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{tag}: {(time.time()-t0)/n2*1e3:.2f} ms", flush=True)


# --- CCD-style doubles residual, sliced V hoisted (as in ccd_solve_jit) ---
blocks = ccd_mod.CCDBlocks(klij=d['klij'], ijab=d['ijab'], abij=d['abij'],
                           iajb=d['iajb'], iabj=d['iabj'], abcd=None,
                           ladder=lad)
V_ij = ccd_mod.blocks_ij_from(blocks)
f_ab, f_ij = fock[no:, no:], fock[:no, :no]

for mode in ("ozaki:7:6", "ozaki:5:4"):
    S = int(mode.split(":")[1])
    V_s = V_ij._replace(sliced=ccd_mod.preslice_ring_blocks(V_ij, S))
    from pymes_tpu.ops.ueg_ladder import preslice_block_ladder
    V_s = V_s._replace(ladder_presliced=preslice_block_ladder(lad, S))
    jax.block_until_ready(V_s.sliced["ijab"][0])
    timeit(f"CCD residual sliced ({mode})",
           lambda t, V=V_s, m=mode: ccd_mod.doubles_residual_ij(
               f_ab, f_ij, t, V, contract_mode=m),
           (T2,))

# --- full mf-CCSD iteration (dressed blocks sliced per iteration) ---
from pymes_tpu.mixer import diis
D_ai = 1.0 / (eps_i[None, :] - eps_a[:, None] - 1.0)
D_ij = 1.0 / (eps_i[:, None, None, None] + eps_i[None, :, None, None]
              - eps_a[None, None, :, None] - eps_a[None, None, None, :]
              - 1.0)
n_flat = nv * no + nv * nv * no * no
ds = diis.init_state(6, n_flat, jnp.float64)

for mode in ("ozaki:7:6", "ozaki:5:4"):
    timeit(f"FULL ccsd_iteration ({mode})",
           lambda t1, t2, m=mode: ccsd_mod.ccsd_iteration(
               fock, dict_V, no, t1, t2, D_ai, D_ij, ds, jnp.zeros(()),
               ladder_all=lad_all, contract_mode=m, layout="ijab")[:2],
           (T1, T2))

print("PROBE W DONE", flush=True)
