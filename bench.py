"""Driver benchmark: CCD amplitude-iteration wall-clock on the real TPU.

North-star metric (BASELINE.json): CCSD/CCD per-iteration wall-clock +
iterations-to-1e-8 Ha on the UEG 14-electron, rs=0.5, cutoff=5 system
(nP=57, no=7, nv=50) in full float64.

The measured quantity is the steady-state per-iteration time of the fully
on-device fixed point (``ccd_solve_jit``: residual build with the
particle-particle ladder, Jacobi update, on-device DIIS, energy + dE,
convergence test — one ``lax.while_loop``, one dispatch for the whole
solve).  The first solve pays compile; the second is timed.

``vs_baseline`` is the speedup over the reference implementation
(nickirk/pymes, pure numpy ``np.einsum`` CCD) measured on THIS machine's
CPU for the same system and convergence target: 2161 ms/iteration
(max_iter 22 vs 2 differencing; see .bench notes / round-1 log).

Prints exactly one JSON line on stdout; diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np

REF_CPU_MS_PER_ITER = 2161.0
ORACLE_E = -0.5120153512190824


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    import pymes_tpu  # noqa: F401  (x64 on)
    import jax
    import jax.numpy as jnp

    from pymes_tpu.log import set_verbosity
    from pymes_tpu.mean_field import hf
    from pymes_tpu.models import ueg
    from pymes_tpu.solver import ccd, mp2

    set_verbosity(-1)
    log("devices:", jax.devices())

    t0 = time.time()
    u = ueg.UEG(14, 7, 7, 0.5)
    u.init_single_basis(5)
    idx, vals = u.eval_2b_integrals(sp=2)
    n_p = u.n_spatial
    no = 7
    log(f"integrals: nP={n_p}, nnz={len(vals)} "
        f"({time.time() - t0:.1f}s host)")

    # ship the momentum-conservation-sparse integral list (~4 MB), build
    # the named o/v blocks on device and the momentum-block-diagonal
    # ladder plan on host — the production path holds NO nv^4 tensor
    t0 = time.time()
    from pymes_tpu.ops.ueg_ladder import build_block_ladder
    NEED = ('klij', 'ijab', 'abij', 'iajb', 'iabj', 'aibj', 'aijb')
    d = ueg.sparse_to_blocks(idx, vals, n_p, no, names=NEED,
                             dtype=jnp.float64)
    kin = jnp.asarray(u.kinetic_energies())
    eps_i = hf.calcOccupiedOrbE(kin, d['klij'], no)
    eps_a = hf.calcVirtualOrbE(kin, d['aibj'], d['aijb'], no, n_p - no)
    fock = jnp.diag(jnp.concatenate([eps_i, eps_a]))
    lad = build_block_ladder(u)
    blocks = ccd.CCDBlocks(klij=d['klij'], ijab=d['ijab'], abij=d['abij'],
                           iajb=d['iajb'], iabj=d['iabj'], abcd=None,
                           ladder=lad)
    jax.block_until_ready(blocks.abij)
    log(f"upload+blocks+plan: {time.time() - t0:.1f}s")

    _, T0 = mp2.solve(eps_i, eps_a, blocks.ijab, blocks.abij, -1.0)

    # production path (round 2): matrix-free momentum-block ladder +
    # occupied-leading loop layout.  At this size the ring contractions
    # are small enough that xla-f64 beats the sliced-MXU backend
    # (which shines at nP >= 123; benchmarks/RESULTS.md)
    def solve():
        out = ccd.ccd_solve_jit(fock, blocks, no, T0, level_shift=-1.0,
                                delta_e=1e-8, max_iter=60,
                                contract_mode="xla", layout="ijab")
        return float(out[0]), int(out[5])

    t0 = time.time()
    e, n_it = solve()
    log(f"warmup solve: e={e:.10f} iters={n_it} "
        f"wall={time.time() - t0:.1f}s (includes compile)")

    t0 = time.time()
    e, n_it = solve()
    wall = time.time() - t0
    per_iter_ms = wall / max(n_it, 1) * 1e3
    log(f"timed solve: e={e:.10f} iters={n_it} wall={wall:.2f}s "
        f"per-iter={per_iter_ms:.1f}ms")
    log(f"energy vs oracle: {abs(e - ORACLE_E):.2e} "
        f"(oracle {ORACLE_E})")
    if abs(e - ORACLE_E) > 1e-6:
        log("WARNING: converged energy off the golden value!")

    # --- secondary, FLOP-bound metric (VERDICT r2 task 7): the nP=57
    # primary is latency-bound (RESULTS.md), so round-over-round perf is
    # also tracked at cutoff 14 (nP=219, ~95 GFLOP/residual) where the MXU
    # does the work: one mf-CCD doubles residual, ozaki backend, with the
    # achieved f64-effective and raw-MXU TFLOP/s from the exact padded
    # sector-GEMM counts.
    secondary = None
    try:
        from pymes_tpu.util import roofline

        t0 = time.time()
        u2 = ueg.UEG(14, 7, 7, 0.5)
        u2.init_single_basis(14)
        idx2, vals2 = u2.eval_2b_integrals(sp=2)
        n_p2 = u2.n_spatial
        nv2 = n_p2 - no
        d2 = ueg.sparse_to_blocks(idx2, vals2, n_p2, no, names=NEED,
                                  dtype=jnp.float64)
        lad2 = build_block_ladder(u2)
        log(f"secondary setup: nP={n_p2} ({time.time() - t0:.1f}s)")
        blocks2 = ccd.CCDBlocksIJ(
            klij=d2['klij'], ijab=d2['ijab'],
            ijab_x=jnp.transpose(d2['ijab'], (0, 1, 3, 2)),
            abij_t=jnp.transpose(d2['abij'], (2, 3, 0, 1)),
            ikac=jnp.transpose(d2['iajb'], (2, 0, 1, 3)),
            kjcb=jnp.transpose(d2['iabj'], (0, 3, 2, 1)),
            abcd=None, ladder=lad2)
        kin2 = jnp.asarray(u2.kinetic_energies())
        eps_i2 = hf.calcOccupiedOrbE(kin2, d2['klij'], no)
        eps_a2 = hf.calcVirtualOrbE(kin2, d2['aibj'], d2['aijb'], no, nv2)
        f_ab = jnp.diag(eps_a2)
        f_ij = jnp.diag(eps_i2)
        _, T2g = mp2.solve(eps_i2, eps_a2, d2['ijab'], d2['abij'], -1.0)
        T2g = jnp.transpose(T2g, (2, 3, 0, 1))  # ijab layout

        mode = "ozaki:7:6"
        S = 7
        from pymes_tpu.ops.ueg_ladder import preslice_block_ladder
        blocks2 = blocks2._replace(
            sliced=ccd.preslice_ring_blocks(blocks2, S),
            ladder_presliced=preslice_block_ladder(lad2, S))
        # pass EVERYTHING as jit args: closed-over 30 MB blocks become
        # graph constants and XLA's compile-time constant folder chews
        # through them for minutes (benchmarks/probe_w2_args.py)
        res_jit = jax.jit(
            ccd.doubles_residual_ij,
            static_argnames=("is_dcd", "is_bruekner", "contract_mode",
                             "ring_mesh", "ring_axis"))
        t0 = time.time()
        jax.block_until_ready(res_jit(f_ab, f_ij, T2g, blocks2,
                                      contract_mode=mode))
        log(f"secondary compile+first: {time.time() - t0:.1f}s")
        jax.block_until_ready(res_jit(f_ab, f_ij, T2g, blocks2,
                                      contract_mode=mode))
        t0 = time.time()
        n_rep = 20
        out = None
        for _ in range(n_rep):
            out = res_jit(f_ab, f_ij, T2g, blocks2, contract_mode=mode)
        jax.block_until_ready(out)
        sec = (time.time() - t0) / n_rep
        eff_lad = roofline.block_ladder_flops(lad2, no * no)
        terms = roofline.ccd_iteration_flops(no, nv2, ladder_flops=eff_lad)
        eff_tflops = terms["TOTAL"] / sec / 1e12
        raw_tflops = 49 * terms["TOTAL"] / sec / 1e12  # S=7 slices
        log(roofline.report("secondary mf-CCD residual nP=219", sec,
                            terms["TOTAL"], 49 * terms["TOTAL"]))
        secondary = {
            "metric": "ueg14_rs0.5_c14_ccd_residual_wall",
            "value": round(sec * 1e3, 2),
            "unit": "ms/residual",
            "eff_f64_tflops": round(eff_tflops, 2),
            "raw_mxu_tflops": round(raw_tflops, 1),
            "pct_v5e_bf16_peak": round(
                100 * raw_tflops / roofline.V5E_BF16_TFLOPS, 1),
        }
    except Exception as exc:  # secondary must never break the driver line
        log(f"secondary metric failed: {exc!r}")

    out = {
        "metric": "ueg14_rs0.5_c5_ccd_f64_iter_wall",
        "value": round(per_iter_ms, 2),
        "unit": "ms/iteration",
        "vs_baseline": round(REF_CPU_MS_PER_ITER / per_iter_ms, 1),
    }
    if secondary is not None:
        out["secondary"] = secondary
    print(json.dumps(out))


if __name__ == "__main__":
    main()
