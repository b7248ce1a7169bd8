"""Probe W2: same sliced-engine measurements as probe W but with every
operand passed as a jit ARGUMENT (probe W's lambdas closed over the
sliced V blocks — XLA embeds them as constants and its compile-time
constant folder chews through 30 MB transposes: 1094 s compiles).

Run: timeout 2400 python -u benchmarks/probe_w2_args.py > /tmp/probe_w2.out 2>&1
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
from pymes_tpu.ops.ueg_ladder import (build_block_ladder, build_ovvv_plans,
                                      preslice_block_ladder)
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


def timeit(tag, fn, args, n1=2, n2=10):
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


blocks = ccd_mod.CCDBlocks(klij=d['klij'], ijab=d['ijab'], abij=d['abij'],
                           iajb=d['iajb'], iabj=d['iabj'], abcd=None,
                           ladder=lad)
V_ij = ccd_mod.blocks_ij_from(blocks)
f_ab, f_ij = fock[no:, no:], fock[:no, :no]

res_jit = jax.jit(ccd_mod.doubles_residual_ij,
                  static_argnames=("is_dcd", "is_bruekner", "contract_mode",
                                   "ring_mesh", "ring_axis"))

for mode in ("ozaki:7:6", "ozaki:5:4"):
    S = int(mode.split(":")[1])
    V_s = V_ij._replace(sliced=ccd_mod.preslice_ring_blocks(V_ij, S),
                        ladder_presliced=preslice_block_ladder(lad, S))
    jax.block_until_ready(V_s.sliced["ijab"][0])
    timeit(f"CCD residual sliced args ({mode})",
           lambda t, V, m=mode: res_jit(f_ab, f_ij, t, V, contract_mode=m),
           (T2, V_s))

# full iteration, dict_V as args through a jitted wrapper
from pymes_tpu.mixer import diis
D_ai = 1.0 / (eps_i[None, :] - eps_a[:, None] - 1.0)
D_ij = 1.0 / (eps_i[:, None, None, None] + eps_i[None, :, None, None]
              - eps_a[None, None, :, None] - eps_a[None, None, None, :]
              - 1.0)
n_flat = nv * no + nv * nv * no * no
ds = diis.init_state(6, n_flat, jnp.float64)


@jax.jit
def full_iter(fock_, dv, t1, t2, dai, dij, ds_):
    return ccsd_mod.ccsd_iteration(fock_, dv, no, t1, t2, dai, dij,
                                   ds_, jnp.zeros(()), ladder_all=lad_all,
                                   contract_mode="ozaki:7:6",
                                   layout="ijab")[:2]


timeit("FULL ccsd_iteration args (ozaki:7:6)", full_iter,
       (fock, dict_V, T1, T2, D_ai, D_ij, ds))
print("PROBE W2 DONE", flush=True)
