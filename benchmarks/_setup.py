"""Shared setup for the benchmark probes (VERDICT r4 task 8).

Every excited-state/scale probe builds the same object graph: a UEG
system at some cutoff, its sparse integrals scattered into the named
V-blocks, HF orbital energies, the all-bra block ladder + OVVV gather
plans (the production matrix-free no-ovvv config), a converged mf-CCD
T2, and the EOM operator dict.  One implementation here instead of a
~60-line block per probe.

Not part of the package API — probes only.
"""
import sys
import time

import numpy as np

import pymes_tpu  # noqa: F401  (x64 + cache config)
import jax.numpy as jnp

from pymes_tpu.models import ueg
from pymes_tpu.mean_field import hf
from pymes_tpu.solver import ccd
from pymes_tpu.ops.ueg_ladder import build_block_ladder, build_ovvv_plans

NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj', 'aijb',
        'ijka', 'ijak', 'iajk')


def build_ueg_mf(cutoff, contract_mode="ozaki:7:6", solve_ccd=True,
                 rs=0.5, max_iter=60, verbose=True):
    """UEG(14e, rs) at ``cutoff`` in the matrix-free no-ovvv config.

    Returns a dict with keys: u, no, nv, n_p, fock, blocks (CCDBlocks for
    ground-state solves), Vd (EOM operator dict: no abcd/ovvv blocks,
    block ladder + gather plans attached), T2 (converged mf-CCD
    amplitudes; None if solve_ccd=False), e_ccd, bp_all, d (raw block
    dict), setup_s / ccd_s wall seconds.
    """
    t0 = time.time()
    u = ueg.UEG(14, 7, 7, rs)
    u.init_single_basis(cutoff)
    no, n_p = 7, u.n_spatial
    nv = n_p - no
    idx, vals = u.eval_2b_integrals(sp=2)
    d = ueg.sparse_to_blocks(idx, vals, n_p, no, names=NEED,
                             dtype=jnp.float64)
    kin = jnp.asarray(u.kinetic_energies())
    eps_i = hf.calcOccupiedOrbE(kin, d['klij'], no)
    eps_a = hf.calcVirtualOrbE(kin, d['aibj'], d['aijb'], no, nv)
    fock = jnp.diag(jnp.concatenate([eps_i, eps_a]))
    bp_all = build_block_ladder(u, bra="all")
    blocks = ccd.CCDBlocks(klij=d['klij'], ijab=d['ijab'], abij=d['abij'],
                           iajb=d['iajb'], iabj=d['iabj'], abcd=None,
                           ladder=bp_all)
    Vd = {k: d[k] for k in ('klij', 'ijab', 'abij', 'iajb', 'iabj',
                            'ijka', 'ijak', 'iajk')}
    Vd["abcd"] = None
    Vd["abcd_ladder"] = bp_all
    Vd["_ovvv_plans"] = build_ovvv_plans(u)
    setup_s = time.time() - t0

    T2, e_ccd, ccd_s = None, None, 0.0
    if solve_ccd:
        t0 = time.time()
        res = ccd.CCD(no).solve(fock, blocks, level_shift=-1.0,
                                max_iter=max_iter,
                                contract_mode=contract_mode)
        ccd_s = time.time() - t0
        T2 = jnp.asarray(res["t2 amp"])
        e_ccd = float(res["ccd e"])
        if verbose:
            print(f"cutoff={cutoff} nP={n_p}: CCD e={e_ccd:.10f} "
                  f"setup={setup_s:.1f}s ccd={ccd_s:.1f}s", flush=True)
    elif verbose:
        print(f"cutoff={cutoff} nP={n_p}: setup={setup_s:.1f}s", flush=True)

    return dict(u=u, no=no, nv=nv, n_p=n_p, fock=fock, blocks=blocks,
                Vd=Vd, T2=T2, e_ccd=e_ccd, bp_all=bp_all, d=d,
                setup_s=setup_s, ccd_s=ccd_s)
