"""Probe S: roofline quantification (VERDICT r2 task 7).

Measures the block-ladder apply and the full mf-CCD iteration at
S_CUTOFFS (default 14,20 -> nP=219,389) and converts to achieved
f64-effective TFLOP/s and raw bf16-MXU TFLOP/s vs the v5e peak, using
the exact padded-sector GEMM counts of the plan
(``pymes_tpu.util.roofline``).

Run: python -u benchmarks/probe_s_roofline.py > /tmp/probe_s.out 2>&1
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
from pymes_tpu.ops.ueg_ladder import build_block_ladder, ladder_apply_ij
from pymes_tpu.util import roofline
from pymes_tpu.log import set_verbosity

set_verbosity(-1)
print("devices:", jax.devices(), flush=True)

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj', 'aijb')
MODE = os.environ.get('S_MODE', 'ozaki:7:6')
N_SLICES = int(MODE.split(":")[1]) if ":" in MODE else 9

for cutoff in [int(c) for c in
               os.environ.get("S_CUTOFFS", "14,20").split(",")]:
    u = ueg.UEG(14, 7, 7, 0.5)
    u.init_single_basis(cutoff)
    no, n_p = 7, u.n_spatial
    nv = n_p - no
    t0 = time.time()
    idx, vals = u.eval_2b_integrals(sp=2)
    t_int = time.time() - t0
    t0 = time.time()
    lad = build_block_ladder(u)              # bra="virtual" pp ladder
    t_plan = time.time() - t0
    d = ueg.sparse_to_blocks(idx, vals, n_p, no, names=NEED,
                             dtype=jnp.float64)
    kin = jnp.asarray(u.kinetic_energies())
    eps_i = hf.calcOccupiedOrbE(kin, d['klij'], no)
    eps_a = hf.calcVirtualOrbE(kin, d['aibj'], d['aijb'], no, nv)
    fock = jnp.diag(jnp.concatenate([eps_i, eps_a]))
    print(f"\n=== cutoff={cutoff} nP={n_p} nv={nv} "
          f"(integrals {t_int:.1f}s, plan {t_plan:.1f}s) ===", flush=True)

    no2 = no * no
    eff_lad = roofline.block_ladder_flops(lad, no2)
    raw_lad = roofline.block_ladder_mxu_flops(lad, no2, N_SLICES)
    dense_equiv = roofline.dense_ladder_flops(no, nv)
    dims = roofline.block_ladder_gemm_dims(lad)
    tot_sec = sum(nS for nS, _, _ in dims)
    print(f"ladder plan: {len(dims)} buckets, {tot_sec} padded sectors, "
          f"eff {eff_lad/1e9:.2f} GFLOP/apply "
          f"(dense equiv {dense_equiv/1e9:.1f} GFLOP, "
          f"{dense_equiv/eff_lad:.1f}x saved)", flush=True)

    rng = np.random.default_rng(0)
    T2 = jnp.asarray(rng.standard_normal((no, no, nv, nv)) * 1e-2)

    def timeit(fn, *args, n=20):
        out = jax.block_until_ready(fn(*args))
        jax.block_until_ready(fn(*args))
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.time() - t0) / n

    # 1. ladder apply alone (sliced sector GEMMs on the MXU)
    f_lad = jax.jit(lambda t: ladder_apply_ij(lad, t))
    s_lad = timeit(f_lad, T2)
    print(roofline.report("ladder apply (ozaki sectors)", s_lad,
                          eff_lad, raw_lad), flush=True)

    # 2. full CCD doubles residual (ozaki contract mode)
    blocks_ij = ccd_mod.CCDBlocksIJ(
        klij=d['klij'], ijab=d['ijab'],
        ijab_x=jnp.transpose(d['ijab'], (0, 1, 3, 2)),
        abij_t=jnp.transpose(d['abij'], (2, 3, 0, 1)),
        ikac=jnp.transpose(d['iajb'], (2, 0, 1, 3)),
        kjcb=jnp.transpose(d['iabj'], (0, 3, 2, 1)),
        abcd=None, ladder=lad)
    terms = roofline.ccd_iteration_flops(no, nv, ladder_flops=eff_lad)
    for k, v in terms.items():
        print(f"  {k}: {v/1e9:.2f} GFLOP", flush=True)

    def resid(t):
        return ccd_mod.doubles_residual_ij(fock[no:, no:], fock[:no, :no],
                                           t, blocks_ij,
                                           contract_mode=MODE)
    s_res = timeit(jax.jit(resid), T2)
    # raw-MXU estimate: every counted term runs through the sliced path
    raw_total = N_SLICES ** 2 * terms["TOTAL"]
    print(roofline.report("CCD doubles residual", s_res,
                          terms["TOTAL"], raw_total), flush=True)
    print(f"  (raw estimate assumes all terms sliced at S={N_SLICES})",
          flush=True)

print("\nPROBE S DONE", flush=True)
