"""FLOP accounting for the hot CC kernels (roofline bookkeeping).

BASELINE.md's north-star metric is "per-iteration wall-clock at the matmul
roofline of the vvvv contraction on a v5e"; this module makes the claim
quantifiable (VERDICT r2 task 7): f64-*effective* FLOPs (the 2MNK a CPU
dgemm would do) per solver iteration, plus the *raw* MXU work the Ozaki
integer decomposition actually issues (S² bf16-carried slice matmuls per
f64 matmul on the stacked path).

Peaks (single TPU v5e chip, public spec): 197 TFLOP/s bf16, 394 TOPS int8.
XLA's emulated f64 has no hardware peak — measured ~0.9 TFLOP/s on big
matmuls here (benchmarks/RESULTS.md), which is why the Ozaki path exists.
"""

V5E_PEAK_BF16 = 197e12
V5E_PEAK_INT8 = 394e12


def block_ladder_flops(plan, no):
    """f64-effective FLOPs of one BlockLadder application on (no², nv²)
    amplitudes: Σ_groups 2·nS·mB·mK·no² (includes bucket padding — also
    returned unpadded for the padding-efficiency ratio)."""
    no2 = no * no
    padded = 0
    for g in plan.groups:
        nS, mB, mK = g.blocks.shape
        padded += 2 * nS * mB * mK * no2
    return padded


def ozaki_raw_factor(n_slices):
    """Raw MXU multiply-adds per f64-effective FLOP on the stacked
    fast path (all S² slice pairs enter the stacked matmuls)."""
    return n_slices * n_slices


def ccd_ij_iteration_flops(no, nv, plan=None):
    """f64-effective FLOPs of one occupied-leading CCD iteration
    (doubles_residual_ij term by term; solver/ccd.py).  ``plan`` (a
    BlockLadder) supplies the ladder cost; None counts the dense
    2·no²·nv⁴ contraction."""
    o2, o3, o4 = no ** 2, no ** 3, no ** 4
    v2, v3 = nv ** 2, nv ** 3
    f = 0
    f += 2 * o4 * v2            # I_klij T2 renormalisation
    f += 2 * o4 * v2            # klij,klab->ijab
    if plan is not None:
        f += block_ladder_flops(plan, no)
    else:
        f += 2 * o2 * nv ** 4   # dense pp ladder
    f += 2 * 2 * o3 * v3        # X_ljac + its contraction
    f += 2 * 2 * o3 * v3        # quadratic ring X_kjcb + contraction
    f += 2 * o2 * v3 + 2 * o3 * v2   # X_ac, X_ki dressings
    f += 2 * o2 * v3 + 2 * o3 * v2   # Ex: ac,ijcb + ki,kjab
    f += 3 * 2 * o3 * v3        # Ex ring terms (ikac/ikbc/tilde)
    f += 3 * 2 * o3 * v3        # non-DCD X_lica + 2 contractions
    return f


def ccsd_ij_iteration_flops(no, nv, plan_all=None):
    """f64-effective FLOPs of one matrix-free T1-dressed CCSD iteration:
    the CCD residual (with the all-bra ladder W) + dressing/singles terms
    that scale beyond O(no²nv²) (ovvv gathers are O(no·nv²·nq) lookups,
    counted as their multiply volume)."""
    o2, o3 = no ** 2, no ** 3
    v2, v3 = nv ** 2, nv ** 3
    f = ccd_ij_iteration_flops(no, nv, plan=None) - 2 * o2 * nv ** 4
    if plan_all is not None:
        f += block_ladder_flops(plan_all, no)   # all-bra W
    # T1-dressing chains: each dressed block term is a T1 (nv·no) matvec
    # over the block — bounded by a few × 2·no·nv·(block size)
    f += 10 * 2 * no * nv * o2 * v2
    # singles residual V·T̃ contractions
    f += 2 * 2 * o3 * v3 // nv + 4 * 2 * o2 * v2 * no * nv
    return f


def achieved_tflops(flops, seconds):
    return flops / seconds / 1e12
