"""Round-4 probe: piece timing of the post-fusion mf-CCSD iteration at
nP=219 (82.2 ms/iter at ozaki:7:6; target <= 60) + an f32-carrier
experiment for the dressing chains.

Run: python -u benchmarks/probe_r4_break.py > /tmp/probe_r4_break.out 2>&1
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
                                      ladder_apply_ij)
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj', 'aijb',
        'ijka', 'ijak', 'iajk')
MODE = os.environ.get('R_MODE', 'ozaki:7:6')
u = ueg.UEG(14, 7, 7, 0.5)
u.init_single_basis(int(os.environ.get('R_CUTOFF', 14)))
no, n_p = 7, u.n_spatial
nv = n_p - no
idx, vals = u.eval_2b_integrals(sp=2)
lad_all = build_block_ladder(u, bra="all")
d = ueg.sparse_to_blocks(idx, vals, n_p, no, names=NEED, dtype=jnp.float64)
kin = jnp.asarray(u.kinetic_energies())
eps_i = hf.calcOccupiedOrbE(kin, d['klij'], no)
eps_a = hf.calcVirtualOrbE(kin, d['aibj'], d['aijb'], no, nv)
fock = jnp.diag(jnp.concatenate([eps_i, eps_a]))
dict_V = dict(d)
dict_V["_ovvv_plans"] = build_ovvv_plans(u)
print(f"nP={n_p} mode={MODE}", flush=True)

rng = np.random.default_rng(0)
T1 = jnp.asarray(rng.standard_normal((nv, no)) * 1e-3)
T2_ij = jnp.asarray(rng.standard_normal((no, no, nv, nv)) * 1e-2)
jax.block_until_ready((T1, T2_ij))


def timeit(tag, make_fn, n2=10):
    fn = jax.jit(make_fn)
    t0 = time.time()
    jax.block_until_ready(fn(T1, T2_ij))
    comp = time.time() - t0
    for _ in range(2):
        jax.block_until_ready(fn(T1, T2_ij))
    t0 = time.time()
    out = None
    for _ in range(n2):
        out = fn(T1, T2_ij)
    jax.block_until_ready(out)
    print(f"{tag}: {(time.time()-t0)/n2*1e3:.1f} ms  (compile {comp:.0f}s)",
          flush=True)


# pieces of the NEW iteration structure
def batched_ladder(t1, t2):
    no2 = no * no
    X_ij = jnp.einsum("ci,dj->ijcd", t1, t1)
    TX = jnp.stack([t2.reshape(no2, -1),
                    X_ij.reshape(no2, -1)]).reshape(2, no2, nv, nv)
    return ladder_apply_ij(lad_all, TX)


timeit("batched ladder (W on T2 + W on T1xT1)", batched_ladder)
timeit("dressed fock", lambda t1, t2: ccsd_mod.get_T1_dressed_fock(
    fock, t1, dict_V, no=no, contract_mode=MODE))
timeit("ex_half dressing (half-symmetric abij)",
       lambda t1, t2: ccsd_mod.dressed_block(
           "abij", dict_V, t1, skip_sources=("abcd",), contract_mode=MODE,
           out_perm=(2, 3, 0, 1), skip_identity=True, half_symmetric=True))


def dress_small(t1, t2):
    keys = ("klij", "ijab", "iajb", "iabj")
    return {k: ccsd_mod.dressed_block(k, dict_V, t1, contract_mode=MODE)
            for k in keys}


timeit("dressed small blocks (klij/ijab/iajb/iabj)", dress_small)


# f32-carrier experiment: the same ex_half chains computed with f32
# T1/V inputs (native-MXU GEMMs + f32 elementwise accumulation), output
# cast back — measures the dressing's precision-tax ceiling
dict_V32 = jax.tree_util.tree_map(
    lambda x: x.astype(jnp.float32)
    if (hasattr(x, "dtype") and x.dtype == jnp.float64) else x, dict_V)


def ex_half_f32(t1, t2):
    with jax.default_matmul_precision("float32"):
        out = ccsd_mod.dressed_block(
            "abij", dict_V32, t1.astype(jnp.float32),
            skip_sources=("abcd",), contract_mode="xla",
            out_perm=(2, 3, 0, 1), skip_identity=True,
            half_symmetric=True)
    return out.astype(jnp.float64)


timeit("ex_half dressing in f32 carriers", ex_half_f32)


def small_f32(t1, t2):
    keys = ("klij", "ijab", "iajb", "iabj")
    t1f = t1.astype(jnp.float32)
    with jax.default_matmul_precision("float32"):
        out = {k: ccsd_mod.dressed_block(k, dict_V32, t1f,
                                         contract_mode="xla")
               for k in keys}
    return {k: v.astype(jnp.float64) for k, v in out.items()}


timeit("dressed small blocks in f32 carriers", small_f32)

# accuracy of the f32 carriers vs f64
a = jax.jit(lambda t1, t2: ccsd_mod.dressed_block(
    "abij", dict_V, t1, skip_sources=("abcd",), contract_mode="xla",
    out_perm=(2, 3, 0, 1), skip_identity=True,
    half_symmetric=True))(T1, T2_ij)
b = jax.jit(ex_half_f32)(T1, T2_ij)
scale = float(jnp.max(jnp.abs(jnp.asarray(dict_V["abij"]))))
err = float(jnp.max(jnp.abs(a - b)))
print(f"f32-carrier ex_half max abs err = {err:.2e} "
      f"(vs |V| scale {scale:.2e}; rel {err/scale:.2e})", flush=True)

# full iteration for reference
from pymes_tpu.mixer import diis
D_ai = 1.0 / (eps_i[None, :] - eps_a[:, None] - 1.0)
D_ij = 1.0 / (eps_i[:, None, None, None] + eps_i[None, :, None, None]
              - eps_a[None, None, :, None] - eps_a[None, None, None, :]
              - 1.0)
n_flat = nv * no + nv * nv * no * no
ds = diis.init_state(6, n_flat, jnp.float64)


def full_iter(t1, t2):
    return ccsd_mod.ccsd_iteration(fock, dict_V, no, t1, t2, D_ai, D_ij,
                                   ds, jnp.zeros(()), ladder_all=lad_all,
                                   contract_mode=MODE, layout="ijab")[:2]


timeit("FULL iteration", full_iter, n2=20)
print("PROBE R4 BREAK DONE", flush=True)
