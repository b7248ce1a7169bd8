"""Driver benchmark: CCD amplitude-iteration wall-clock on the real TPU.

North-star metric (BASELINE.json): CCSD/CCD per-iteration wall-clock +
iterations-to-1e-8 Ha on the UEG 14-electron, rs=0.5, cutoff=5 system
(nP=57, no=7, nv=50) in full float64.

Methodology (round 4, VERDICT r3 task 3): the nP=57 solve is
latency-bound — a converged solve takes 6 iterations (~90 ms wall), so
the single solve dispatch + host sync (~30-60 ms through the axon
tunnel) pollutes the per-iteration number by 5-10 ms and wobbles it
±30% run-to-run (11-18 ms recorded across rounds 2-3).  The primary
metric is therefore the min over 5 *fixed-61-iteration* solves
(``delta_e=0`` runs the identical compiled while_loop program to the
iteration cap), which amortizes the dispatch to <1 ms/iter; the
converged-solve number and its spread are reported alongside for
continuity with rounds 1-3.

Secondary metric (VERDICT r3 task 8): a FULL mf-CCD iteration at nP=219
(momentum-block ladder + rings + Jacobi + DIIS + energy, ozaki:7:6),
timed as a fixed-iteration ``ccd_solve_jit`` — not just the residual.
Roofline framing: the useful-work number is eff-f64 TFLOP/s; the
*achievable* f64 roofline through the Ozaki engine is bf16-peak/S²
(S=7 ⇒ 49 slice-pair MXU products per useful f64 product — redundancy,
not useful work), and the reported percentage is of THAT.

``vs_baseline`` is the speedup over the reference implementation
(nickirk/pymes, pure numpy ``np.einsum`` CCD) measured on THIS machine's
CPU for the same system: 2161 ms/iteration (round-1 log).

Compile/setup budget (VERDICT r3 task 2) is first-class: every stage is
timed and recorded in the JSON (``setup_s``, ``warmup_s``, per-stage
breakdown on stderr).

Prints exactly one JSON line on stdout; diagnostics go to stderr.
"""

import json
import os
import sys
import time

import numpy as np

REF_CPU_MS_PER_ITER = 2161.0
ORACLE_E = -0.5120153512190824
# schema smoke mode for the CPU test suite: 1 timed solve each, no
# nP=219 secondary (the full driver protocol costs ~25 min on CPU)
SMOKE = os.environ.get("PYMES_BENCH_SMOKE", "0") == "1"


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

    t_setup0 = time.time()
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
    jax.block_until_ready(fock)
    log(f"upload+blocks+fock: {time.time() - t0:.1f}s")
    t0 = time.time()
    lad = build_block_ladder(u)
    blocks = ccd.CCDBlocks(klij=d['klij'], ijab=d['ijab'], abij=d['abij'],
                           iajb=d['iajb'], iabj=d['iabj'], abcd=None,
                           ladder=lad)
    jax.block_until_ready(lad.presliced[0][0])
    log(f"ladder plan+preslice: {time.time() - t0:.1f}s")

    t0 = time.time()
    _, T0 = mp2.solve(eps_i, eps_a, blocks.ijab, blocks.abij, -1.0)
    jax.block_until_ready(T0)
    log(f"mp2 start guess: {time.time() - t0:.1f}s")
    setup_s = time.time() - t_setup0

    # production path (round 2): matrix-free momentum-block ladder +
    # occupied-leading loop layout.  At this size the ring contractions
    # are small enough that xla-f64 beats the sliced-MXU backend
    # (which shines at nP >= 123; benchmarks/RESULTS.md)
    def solve(delta_e=1e-8):
        out = ccd.ccd_solve_jit(fock, blocks, no, T0, level_shift=-1.0,
                                delta_e=delta_e, max_iter=60,
                                contract_mode="xla", layout="ijab")
        return float(out[0]), int(out[5])

    # program-size metric (VERDICT r4 task 4): StableHLO op count of the
    # lowered primary program — compile wall-clock context.  Host-side
    # lowering, no device work.
    import re as _re
    t0 = time.time()
    lowered = jax.jit(
        lambda f, b, T: ccd.ccd_solve_jit(
            f, b, no, T, level_shift=-1.0, delta_e=1e-8, max_iter=60,
            contract_mode="xla", layout="ijab")).lower(fock, blocks, T0)
    hlo_ops = len(_re.findall(r"= \"?[\w.]+\"?[( ]", lowered.as_text()))
    log(f"primary program: {hlo_ops} stablehlo ops "
        f"({time.time() - t0:.1f}s lowering)")

    # compile-cache state (VERDICT r4 task 4): the persistent cache makes
    # warmup 78.7 s -> 0.8 s; count new entries to tell a cold compile
    # from a warm-cache cold-process start so the recorded warmup_s is
    # interpretable under either state.
    cache_dir = os.path.expanduser("~/.cache/jax_pymes")
    def _cache_n():
        try:
            return len(os.listdir(cache_dir))
        except OSError:
            return 0
    n_cache0 = _cache_n()
    t0 = time.time()
    e, n_it = solve()
    warmup_s = time.time() - t0
    cache_misses = _cache_n() - n_cache0
    log(f"warmup solve: e={e:.10f} iters={n_it} "
        f"wall={warmup_s:.1f}s (includes compile; "
        f"{cache_misses} new persistent-cache entries -> "
        f"{'COLD compile' if cache_misses else 'warm-cache start'})")
    log(f"energy vs oracle: {abs(e - ORACLE_E):.2e} (oracle {ORACLE_E})")
    if abs(e - ORACLE_E) > 1e-6:
        log("WARNING: converged energy off the golden value!")

    # converged-solve timing (rounds 1-3 methodology, for continuity):
    # noisy at this size — report min and spread over 5
    conv_walls = []
    for _ in range(1 if SMOKE else 5):
        t0 = time.time()
        e, n_it = solve()
        conv_walls.append(time.time() - t0)
    conv_ms = [w / max(n_it, 1) * 1e3 for w in conv_walls]
    log(f"converged solves ({n_it} iters): "
        f"{['%.1f' % m for m in conv_ms]} ms/iter")

    # primary: steady-state per-iteration from fixed-61-iteration solves
    # (delta_e=-1 -> |dE| > -1 always, the while_loop runs to the cap;
    # SAME compiled program, delta_e is a traced scalar; delta_e=0 exits
    # early once dE hits exactly 0.0 in f64), min over 5
    fixed_walls = []
    for _ in range(1 if SMOKE else 5):
        t0 = time.time()
        e_f, n_fixed = solve(delta_e=-1.0)
        fixed_walls.append(time.time() - t0)
    per_iter_ms = min(fixed_walls) / max(n_fixed, 1) * 1e3
    log(f"fixed-{n_fixed}-iteration solves: "
        f"{['%.0f' % (w * 1e3) for w in fixed_walls]} ms wall "
        f"-> min {per_iter_ms:.2f} ms/iter")

    # --- secondary, FLOP-bound metric: the nP=57 primary is
    # latency-bound, so round-over-round perf is also tracked at
    # cutoff 14 (nP=219, ~95 GFLOP/residual) where the MXU does the
    # work: a FULL mf-CCD iteration (ladder + rings + Jacobi + DIIS +
    # energy), ozaki:7:6 backend, fixed-iteration timing.
    secondary = None
    try:
        if SMOKE:
            raise RuntimeError("smoke mode: secondary skipped")
        from pymes_tpu.util import roofline

        t0 = time.time()
        u2 = ueg.UEG(14, 7, 7, 0.5)
        u2.init_single_basis(14)
        idx2, vals2 = u2.eval_2b_integrals(sp=2)
        n_p2 = u2.n_spatial
        nv2 = n_p2 - no
        d2 = ueg.sparse_to_blocks(idx2, vals2, n_p2, no, names=NEED,
                                  dtype=jnp.float64)
        kin2 = jnp.asarray(u2.kinetic_energies())
        eps_i2 = hf.calcOccupiedOrbE(kin2, d2['klij'], no)
        eps_a2 = hf.calcVirtualOrbE(kin2, d2['aibj'], d2['aijb'], no, nv2)
        fock2 = jnp.diag(jnp.concatenate([eps_i2, eps_a2]))
        lad2 = build_block_ladder(u2)
        blocks2 = ccd.CCDBlocks(
            klij=d2['klij'], ijab=d2['ijab'], abij=d2['abij'],
            iajb=d2['iajb'], iabj=d2['iabj'], abcd=None, ladder=lad2)
        _, T2g = mp2.solve(eps_i2, eps_a2, d2['ijab'], d2['abij'], -1.0)
        jax.block_until_ready(T2g)
        sec_setup_s = time.time() - t0
        log(f"secondary setup: nP={n_p2} ({sec_setup_s:.1f}s)")

        mode = "ozaki:7:6"
        S = 7
        N_IT2 = 15

        def solve2(delta_e):
            out = ccd.ccd_solve_jit(fock2, blocks2, no, T2g,
                                    level_shift=-1.0, delta_e=delta_e,
                                    max_iter=N_IT2, contract_mode=mode,
                                    layout="ijab")
            return float(out[0]), int(out[5])

        t0 = time.time()
        e2, _ = solve2(1e-8)
        sec_compile_s = time.time() - t0
        log(f"secondary compile+first solve: {sec_compile_s:.1f}s "
            f"(e={e2:.10f})")
        walls2 = []
        n2 = 0
        for _ in range(3):
            t0 = time.time()
            _, n2 = solve2(-1.0)
            walls2.append(time.time() - t0)
        iter_ms = min(walls2) / max(n2, 1) * 1e3
        sec = iter_ms / 1e3
        eff_lad = roofline.block_ladder_flops(lad2, no * no)
        terms = roofline.ccd_iteration_flops(no, nv2, ladder_flops=eff_lad)
        eff_tflops = terms["TOTAL"] / sec / 1e12
        # Ozaki slice redundancy: S=7 -> 49 bf16 MXU products per useful
        # f64 product.  The f64-ACHIEVABLE roofline through this engine
        # is bf16-peak/49; raw_mxu counts the redundant work (labeled so).
        raw_tflops = 49 * eff_tflops
        ach_roofline = roofline.V5E_BF16_TFLOPS / 49
        log(f"secondary mf-CCD FULL iteration nP=219: {iter_ms:.1f} ms, "
            f"{eff_tflops:.2f} eff-f64 TFLOP/s = "
            f"{100 * eff_tflops / ach_roofline:.0f}% of the ozaki-"
            f"achievable f64 roofline ({ach_roofline:.1f} TFLOP/s at "
            f"S=7); slice-redundant raw MXU {raw_tflops:.1f} TFLOP/s")
        secondary = {
            "metric": "ueg14_rs0.5_c14_ccd_full_iter_wall",
            "value": round(iter_ms, 2),
            "unit": "ms/iteration",
            "method": f"min of 3 fixed-{n2}-iteration solves, full "
                      "iteration (ladder+rings+Jacobi+DIIS+energy)",
            "eff_f64_tflops": round(eff_tflops, 2),
            "pct_ozaki_f64_roofline": round(
                100 * eff_tflops / ach_roofline, 1),
            "raw_mxu_tflops_slice_redundant": round(raw_tflops, 1),
            "setup_s": round(sec_setup_s, 1),
            "compile_s": round(sec_compile_s, 1),
        }
    except Exception as exc:  # secondary must never break the driver line
        log(f"secondary metric failed: {exc!r}")

    out = {
        "metric": "ueg14_rs0.5_c5_ccd_f64_iter_wall",
        "value": round(per_iter_ms, 2),
        "unit": "ms/iteration",
        "vs_baseline": round(REF_CPU_MS_PER_ITER / per_iter_ms, 1),
        "method": f"min of 5 fixed-{n_fixed}-iteration solves "
                  "(r1-3 timed ONE converged 6-iter solve: per-solve "
                  "dispatch latency added 5-10 ms/iter of +-30% noise)",
        "converged_ms_iter": round(min(conv_ms), 2),
        "converged_ms_iter_max": round(max(conv_ms), 2),
        "setup_s": round(setup_s, 1),
        "warmup_s": round(warmup_s, 1),
        "warmup_cache_state": ("cold" if cache_misses else "warm"),
        "program_hlo_ops": hlo_ops,
    }
    if secondary is not None:
        out["secondary"] = secondary
    print(json.dumps(out))


if __name__ == "__main__":
    main()
