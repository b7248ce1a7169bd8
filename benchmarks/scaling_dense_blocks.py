import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import pymes_tpu
import jax, jax.numpy as jnp
from pymes_tpu.models import ueg
from pymes_tpu.mean_field import hf
from pymes_tpu.solver import ccd, mp2
from pymes_tpu.log import set_verbosity
set_verbosity(-1)

NEED = ('klij','ijab','abij','iajb','iabj','abcd','aibj','aijb')
for cutoff in (10, 14):
    t0=time.time()
    u = ueg.UEG(14,7,7,0.5); u.init_single_basis(cutoff)
    idx, vals = u.eval_2b_integrals(sp=2)
    n_p = u.n_spatial; no = 7; nv = n_p-no
    print(f"cutoff={cutoff}: nP={n_p} nnz={len(vals)} gen={time.time()-t0:.1f}s abcd={8*nv**4/1e9:.2f}GB", flush=True)
    t0=time.time()
    d = ueg.sparse_to_blocks(idx, vals, n_p, no, names=NEED, dtype=jnp.float64)
    kin = jnp.asarray(u.kinetic_energies())
    eps_i = hf.calcOccupiedOrbE(kin, d['klij'], no)
    eps_a = hf.calcVirtualOrbE(kin, d['aibj'], d['aijb'], no, nv)
    fock = jnp.diag(jnp.concatenate([eps_i, eps_a]))
    blocks = ccd.blocks_from_dict(d)
    jax.block_until_ready(blocks.abcd)
    print(f"  upload blocks+fock: {time.time()-t0:.1f}s", flush=True)
    _, T0 = mp2.solve(eps_i, eps_a, blocks.ijab, blocks.abij, -1.0)
    for tag, dt in (("f64", jnp.float64), ("f32", jnp.float32)):
        bl = jax.tree_util.tree_map(lambda x: None if x is None else x.astype(dt), blocks)
        t0=time.time()
        out = ccd.ccd_solve_jit(fock.astype(dt), bl, 7, T0.astype(dt), level_shift=-1.0, delta_e=1e-8 if tag=="f64" else 1e-5, max_iter=60)
        e=float(out[0]); n=int(out[5])
        print(f"  {tag} warm: e={e:.10f} iters={n} wall={time.time()-t0:.1f}s", flush=True)
        t0=time.time()
        out = ccd.ccd_solve_jit(fock.astype(dt), bl, 7, T0.astype(dt), level_shift=-1.0, delta_e=1e-8 if tag=="f64" else 1e-5, max_iter=60)
        n=int(out[5]); wl=time.time()-t0
        print(f"  {tag} timed: {wl/n*1e3:.0f} ms/iter over {n} iters", flush=True)
print("DONE", flush=True)
