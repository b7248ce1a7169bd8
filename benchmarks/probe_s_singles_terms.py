"""Probe S: term-level breakdown of singles_residual_ij at nP=219.

probe_r put the singles residual at ~34 ms (incl. its 10.3 ms ladder W) —
second-largest piece of the mf-CCSD iteration after the abij dressing.
Times each term of the occupied-leading singles build separately.

Run: python -u benchmarks/probe_s_singles_terms.py > /tmp/probe_s.out 2>&1
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
from pymes_tpu.solver import ccsd as ccsd_mod
from pymes_tpu.ops.contract import contract as _c
from pymes_tpu.ops.ueg_ladder import (build_block_ladder, build_ovvv_plans,
                                      ladder_apply_ij)
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj', 'aijb',
        'ijka', 'ijak', 'iajk')
cutoff = int(os.environ.get('S_CUTOFF', 14))
MODE = os.environ.get('S_MODE', 'ozaki:7:6')
u = ueg.UEG(14, 7, 7, 0.5)
u.init_single_basis(cutoff)
no, n_p = 7, u.n_spatial
nv = n_p - no
idx, vals = u.eval_2b_integrals(sp=2)
d = ueg.sparse_to_blocks(idx, vals, n_p, no, names=NEED, dtype=jnp.float64)
dict_V = {k: v for k, v in d.items()}
dict_V["_ovvv_plans"] = build_ovvv_plans(u)
lad_all = build_block_ladder(u, bra="all")
print(f"nP={n_p} mode={MODE}", flush=True)

rng = np.random.default_rng(0)
T1 = jnp.asarray(rng.standard_normal((nv, no)) * 1e-3)
T2 = jnp.asarray(rng.standard_normal((no, no, nv, nv)) * 1e-2)
fd = jnp.asarray(rng.standard_normal((n_p, n_p)) * 1e-2)
W = ladder_apply_ij(lad_all, T2)
jax.block_until_ready((T1, T2, fd, W))


def timeit(tag, fn, n2=10):
    jfn = jax.jit(fn)
    out = jfn(T1, T2, W)
    jax.block_until_ready(out)
    jax.block_until_ready(jfn(T1, T2, W))
    t0 = time.time()
    for _ in range(n2):
        out = jfn(T1, T2, W)
    jax.block_until_ready(out)
    print(f"{tag}: {(time.time()-t0)/n2*1e3:.2f} ms", flush=True)


timeit("tilde build (2T - T^swap)",
       lambda t1, t2, w: 2.0 * t2 - jnp.transpose(t2, (1, 0, 2, 3)))

tilde_c = 2.0 * T2 - jnp.transpose(T2, (1, 0, 2, 3))
jax.block_until_ready(tilde_c)

timeit("fov term jb,ijab->ai",
       lambda t1, t2, w: _c("jb,ijab->ai", fd[:no, no:], tilde_c, mode=MODE))
timeit("W tilde + diag (ovvv term)",
       lambda t1, t2, w: jnp.einsum(
           "ijaj->ai",
           (2.0 * w - jnp.transpose(w, (1, 0, 2, 3)))[:, :, no:, :no]))
timeit("X_ki kjbc,ijbc->ki + ak",
       lambda t1, t2, w: _c(
           "ki,ak->ai",
           _c("kjbc,ijbc->ki", dict_V["ijab"], tilde_c, mode=MODE),
           t1, mode=MODE))
timeit("jkib,jkab->ai",
       lambda t1, t2, w: _c("jkib,jkab->ai", dict_V["ijka"], tilde_c,
                            mode=MODE))
timeit("X_ca jkcb,jkab->ca + ci",
       lambda t1, t2, w: _c(
           "ca,ci->ai",
           _c("jkcb,jkab->ca", dict_V["ijab"], tilde_c, mode=MODE),
           t1, mode=MODE))
timeit("FULL singles_residual_ij (tilde inside, no W)",
       lambda t1, t2, w: ccsd_mod.singles_residual_ij(
           fd, t1, t2, dict_V, contract_mode=MODE, ladder_W=w))
print("PROBE S DONE", flush=True)
