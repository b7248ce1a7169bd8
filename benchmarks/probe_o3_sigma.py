"""Probe O3: where do the 350 ms/iter of the fused Davidson go at nP=123?

Times the batched sigma (k=2) alone in both contract modes, the non-sigma
fused-step machinery, and the full fused step.

Run: python -u benchmarks/probe_o3_sigma.py > /tmp/probe_o3.out 2>&1
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
from pymes_tpu.solver import ccd, eom_ccsd
from pymes_tpu.ops.ueg_ladder import build_block_ladder
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj', 'aijb',
        'ijka', 'ijak', 'iajk', 'iabc', 'abic')
u = ueg.UEG(14, 7, 7, 0.5)
u.init_single_basis(int(os.environ.get("O3_CUT", 10)))
no, n_p = 7, u.n_spatial
nv = n_p - no
idx, vals = u.eval_2b_integrals(sp=2)
d = ueg.sparse_to_blocks(idx, vals, n_p, no, names=NEED, dtype=jnp.float64)
kin = jnp.asarray(u.kinetic_energies())
eps_i = hf.calcOccupiedOrbE(kin, d['klij'], no)
eps_a = hf.calcVirtualOrbE(kin, d['aibj'], d['aijb'], no, nv)
fock = jnp.diag(jnp.concatenate([eps_i, eps_a]))
bp = build_block_ladder(u)
blocks = ccd.CCDBlocks(klij=d['klij'], ijab=d['ijab'], abij=d['abij'],
                       iajb=d['iajb'], iabj=d['iabj'], abcd=None, ladder=bp)
res = ccd.CCD(no).solve(fock, blocks, level_shift=-1.0, max_iter=60)
T2 = jnp.asarray(res["t2 amp"])
print(f"nP={n_p}: CCD e={res['ccd e']:.10f}", flush=True)

Vd = {k: d[k] for k in NEED}
Vd["abcd"] = None
Vd["abcd_ladder"] = bp

rng = np.random.default_rng(0)
k = 2
U1 = jnp.asarray(rng.standard_normal((k, nv, no)))
U2 = jnp.asarray(rng.standard_normal((k, nv, nv, no, no)) * 1e-2)
N = nv * no + nv * nv * no * no
max_dim = 8
U = jnp.zeros((max_dim, N)).at[:k].set(
    jnp.concatenate([U1.reshape(k, -1), U2.reshape(k, -1)], axis=1))
W = jnp.zeros((max_dim, N))
v_pad = jnp.zeros((max_dim, k)).at[:k, :k].set(jnp.eye(k))
e_new = jnp.asarray(rng.standard_normal(k))
diag = jnp.asarray(rng.standard_normal(N) + 5.0)


def timeit(tag, fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{tag}: {(time.time()-t0)/n*1e3:.1f} ms", flush=True)
    return out


for mode in ("xla", "ozaki:7:6"):
    hb = eom_ccsd.build_hbar(fock, Vd, T2, contract_mode=mode)
    jax.block_until_ready(hb.A1)

    # 1. batched sigma alone
    sig = jax.jit(lambda u1, u2, m=mode, h=hb: eom_ccsd._sigma_batched_hbar(
        fock, Vd, h, u1, u2, T2, contract_mode=m))
    timeit(f"sigma k=2 [{mode}]", sig, U1, U2)

    # 2. full fused step (packed host IO signature)
    hp = jnp.concatenate([v_pad, e_new[None, :],
                          jnp.zeros_like(v_pad)], axis=0)
    fs = jax.jit(lambda UU, WW, m=mode, h=hb: eom_ccsd._davidson_fused_step(
        fock, Vd, h, T2, UU, WW, hp, diag, k, no, nv,
        contract_mode=m))
    timeit(f"fused step [{mode}]", fs, U, W)
    fsc = jax.jit(lambda UU, WW, m=mode, h=hb: eom_ccsd._davidson_fused_step(
        fock, Vd, h, T2, UU, WW, hp, diag, k, no, nv,
        contract_mode=m, collapse=True))
    timeit(f"fused step+collapse [{mode}]", fsc, U, W)

# 3. the non-sigma machinery alone
timeit("orth_append", lambda R: eom_ccsd._orth_append(U, R),
       jnp.asarray(rng.standard_normal((k, N))))
timeit("residual_precond",
       lambda e: eom_ccsd._residual_precond(U, W, v_pad, e, diag), e_new)

print("PROBE O3 DONE", flush=True)
