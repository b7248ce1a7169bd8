"""Matrix-free UEG CCD scaling on one chip — no nv^4 storage at all.

Round-2 path: momentum-block-diagonal ladder (BlockLadder), ij loop
layout, integer-MXU (ozaki) ring contractions.  The gather-plan/xla
numbers from round 1 are kept in RESULTS.md for comparison.
"""
import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import pymes_tpu
import jax, jax.numpy as jnp
from pymes_tpu.models import ueg
from pymes_tpu.mean_field import hf
from pymes_tpu.solver import ccd, mp2
from pymes_tpu.ops.ueg_ladder import build_block_ladder
from pymes_tpu.log import set_verbosity
set_verbosity(-1)

NEED = ('klij','ijab','abij','iajb','iabj','aibj','aijb')
for cutoff in (14, 20):
    t0=time.time()
    u = ueg.UEG(14,7,7,0.5); u.init_single_basis(cutoff)
    idx, vals = u.eval_2b_integrals(sp=2)
    n_p = u.n_spatial; no = 7; nv = n_p-no
    lad = build_block_ladder(u)
    nnz = sum(int(np.prod(g.blocks.shape)) for g in lad.groups)
    print(f"cutoff={cutoff}: nP={n_p} nnz={len(vals)} padded-blocks={nnz*8/1e6:.0f}MB gen={time.time()-t0:.1f}s (dense abcd would be {8*nv**4/1e9:.1f}GB)", flush=True)
    t0=time.time()
    d = ueg.sparse_to_blocks(idx, vals, n_p, no, names=NEED, dtype=jnp.float64)
    kin = jnp.asarray(u.kinetic_energies())
    eps_i = hf.calcOccupiedOrbE(kin, d['klij'], no)
    eps_a = hf.calcVirtualOrbE(kin, d['aibj'], d['aijb'], no, nv)
    fock = jnp.diag(jnp.concatenate([eps_i, eps_a]))
    blocks = ccd.CCDBlocks(klij=d['klij'], ijab=d['ijab'], abij=d['abij'],
                           iajb=d['iajb'], iabj=d['iabj'], abcd=None, ladder=lad)
    jax.block_until_ready(blocks.abij)
    print(f"  upload: {time.time()-t0:.1f}s", flush=True)
    _, T0 = mp2.solve(eps_i, eps_a, blocks.ijab, blocks.abij, -1.0)
    kw = dict(level_shift=-1.0, delta_e=1e-8, max_iter=60,
              contract_mode="ozaki:7:6", layout="ijab")
    t0=time.time()
    out = ccd.ccd_solve_jit(fock, blocks, 7, T0, **kw)
    e=float(out[0]); n=int(out[5])
    print(f"  f64 warm: e={e:.10f} iters={n} wall={time.time()-t0:.1f}s", flush=True)
    t0=time.time()
    out = ccd.ccd_solve_jit(fock, blocks, 7, T0, **kw)
    n=int(out[5]); wl=time.time()-t0
    print(f"  f64 timed: {wl/n*1e3:.0f} ms/iter over {n} iters", flush=True)
print("DONE", flush=True)
