"""Pallas TPU matmul kernels for the CC ladder contraction.

Measured reality on the v5e used here (2500x2500x512 f64-vs-numpy):
XLA's own matmuls are the bar — xla f32 2.9 ms (2.2 TF/s), xla emulated
f64 7.3 ms (0.9 TF/s, 3e-15 rel err).  Without an explicit
``precision=HIGHEST`` the in-kernel MXU dot uses single-pass bf16
(2.4e-3 rel err); with it the kernels are correct but still ~an order
slower than XLA's pipelined matmul, so they serve as precision-ladder
experiments, not the default hot path — ``ops.ladder`` stays on ``xla``
mode.

Status (round 3): RETAINED as alternative precision backends reachable
through ``ops.ladder.ppl_contract(mode=...)`` and covered by
``tests/test_untested_corners.py``; the production f64-at-MXU-speed path
is the Ozaki int8-slice engine (:mod:`pymes_tpu.ops.ozaki`), which
supersedes ``matmul_ds`` for accuracy (1e-12 vs ~1e-7) and speed.  The
double-single kernel remains the right rung when VMEM pressure rules out
the int8 slice stack (k-slices × 2 operands).

Two kernels back :func:`pymes_tpu.ops.ladder.ppl_contract`:

* :func:`matmul_f32` — tiled f32 MXU matmul (128×128 blocks, K-loop in
  VMEM, f32 accumulation).  The speed-of-light single-chip path for the
  bulk of the mixed-precision amplitude iterations.
* :func:`matmul_ds` — double-single compensated matmul for f64 operands:
  inputs split into hi/lo f32 parts, the three cross products run on the
  MXU with a small K-tile, and the accumulation is carried as an
  (hi, lo) f32 pair with TwoSum error compensation on the VPU.  Per-product
  MXU rounding bounds the accuracy at ~1e-7 relative — an order past plain
  f32 — so it serves as the middle rung of the precision schedule
  (f32 bulk → ds → f64-emulated polish); full 1e-14 needs the XLA f64
  emulation or an Ozaki-split kernel (future work).

Shapes are padded to multiples of the 128-lane tile by the callers.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def _pad2(x, mr, mc):
    r = _round_up(x.shape[0], mr) - x.shape[0]
    c = _round_up(x.shape[1], mc) - x.shape[1]
    if r or c:
        x = jnp.pad(x, ((0, r), (0, c)))
    return x


def _mm_kernel(a_ref, b_ref, o_ref, acc_ref, *, k_steps):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

    @pl.when(pl.program_id(2) == k_steps - 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk"))
def matmul_f32(a, b, bm=256, bn=256, bk=512):
    """C = A @ B in f32 with a tiled Pallas MXU kernel."""
    m0, k0 = a.shape
    _, n0 = b.shape
    bm = min(bm, _round_up(m0, 128))
    bn = min(bn, _round_up(n0, 128))
    bk = min(bk, _round_up(k0, 128))
    a = _pad2(a.astype(jnp.float32), bm, bk)
    b = _pad2(b.astype(jnp.float32), bk, bn)
    m, k = a.shape
    n = b.shape[1]
    k_steps = k // bk

    out = pl.pallas_call(
        functools.partial(_mm_kernel, k_steps=k_steps),
        grid=(m // bm, n // bn, k_steps),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=4 * (m * k + k * n + m * n),
            transcendentals=0),
    )(a, b)
    return out[:m0, :n0]


def _split_hi_lo(x):
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def _ds_kernel(ahi_ref, alo_ref, bhi_ref, blo_ref, ohi_ref, olo_ref,
               acc_hi, acc_lo, *, k_steps):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_hi[:] = jnp.zeros_like(acc_hi)
        acc_lo[:] = jnp.zeros_like(acc_lo)

    hp = jax.lax.Precision.HIGHEST
    p = jnp.dot(ahi_ref[:], bhi_ref[:], preferred_element_type=jnp.float32,
                precision=hp)
    cross = jnp.dot(ahi_ref[:], blo_ref[:],
                    preferred_element_type=jnp.float32, precision=hp)
    cross += jnp.dot(alo_ref[:], bhi_ref[:],
                     preferred_element_type=jnp.float32, precision=hp)

    # TwoSum(acc_hi, p): exact error of the high-order accumulation goes to
    # the low-order carry along with the cross terms
    a = acc_hi[:]
    s = a + p
    bb = s - a
    err = (a - (s - bb)) + (p - bb)
    acc_hi[:] = s
    acc_lo[:] += err + cross

    @pl.when(pl.program_id(2) == k_steps - 1)
    def _():
        ohi_ref[:] = acc_hi[:]
        olo_ref[:] = acc_lo[:]


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk"))
def matmul_ds(a, b, bm=256, bn=256, bk=128):
    """Double-single compensated matmul for f64 (or f32) operands.

    Returns the result in the dtype of ``a`` (hi + lo recombined on the
    host side of the kernel).  The small default K-tile keeps each MXU
    partial product short so its internal rounding stays bounded.
    """
    out_dtype = a.dtype
    m0, k0 = a.shape
    _, n0 = b.shape
    ahi, alo = _split_hi_lo(a)
    bhi, blo = _split_hi_lo(b)
    bm = min(bm, _round_up(m0, 128))
    bn = min(bn, _round_up(n0, 128))
    bk = min(bk, _round_up(k0, 128))
    ahi, alo = (_pad2(x, bm, bk) for x in (ahi, alo))
    bhi, blo = (_pad2(x, bk, bn) for x in (bhi, blo))
    m, k = ahi.shape
    n = bhi.shape[1]
    k_steps = k // bk

    hi, lo = pl.pallas_call(
        functools.partial(_ds_kernel, k_steps=k_steps),
        grid=(m // bm, n // bn, k_steps),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((m, n), jnp.float32),
                   jax.ShapeDtypeStruct((m, n), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32),
                        pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * m * n * k,
            bytes_accessed=4 * (2 * m * k + 2 * k * n + 2 * m * n),
            transcendentals=0),
    )(ahi, alo, bhi, blo)
    out = hi.astype(out_dtype) + lo.astype(out_dtype)
    return out[:m0, :n0]
