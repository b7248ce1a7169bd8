"""Precision-mode dispatch for the solvers' two-operand contractions.

Every hot einsum in the CC residual/sigma builders goes through
:func:`contract` so the numeric backend can be swapped without touching
solver code (the reference hardwired ``np.einsum``; CTF's distributed
einsum played this role historically, ``pymes/solver/ccd.py:11``):

* ``"xla"`` (default) — ``jnp.einsum`` in the working dtype.  In f64 XLA
  emulates on TPU: exact, but far off the MXU rate.
* ``"ozaki"`` — f64 operands split onto the integer MXU path
  (:mod:`pymes_tpu.ops.ozaki`); near-f64 accuracy at a small multiple of
  the f32 matmul cost.  Tiny contractions (below ``_MIN_FLOPS`` or with a
  short contracted axis) stay on XLA, where slicing overhead would
  dominate.  Tune the accuracy/cost point with ``set_mode``'s
  ``n_slices``/``t_cutoff`` — (9, 9) is full f64 (~1e-15 normwise),
  (7, 6) is ~1e-9, ample for a |dE| < 1e-8 fixed point at ~60%% of the
  (9, 9) matmul count.

Mode strings: ``"xla"``, ``"ozaki"`` (= ``"ozaki:9:9"``), or
``"ozaki:S:T"``.  Solvers thread the mode as a *static jit argument* —
a module global alone would silently go stale against jax's trace cache —
and the module-level default only seeds calls that don't pass one.
"""

import jax.numpy as jnp
import numpy as np

from pymes_tpu.ops import ozaki

_MODE = "xla"
_MIN_FLOPS = 1 << 24
_MIN_K = 96

# XLA's emulated-f64 dot lowering is ~60x off roofline when the dot is
# SKINNY (probe G / probe T: a (1484,)-output matvec over K=1484 costs
# ~4 ms where the data traffic is worth ~0.05 ms; a K=7 matmul likewise).
# Two degenerate shapes are therefore lowered as broadcast mul+sum
# (elementwise multiplies + tree reductions, which XLA emulates well):
#  * short contracted axis (K <= _SUM_K_MAX): unrolled loop of K
#    broadcast FMAs, temporary = one output buffer;
#  * small output (<= _SUM_OUT_MAX elements) with the full product
#    affordable (<= _SUM_TMP_MAX elements): one broadcast product,
#    reduced over the contracted axes.
# Real matmuls (big K AND big output) never take these paths.
_SUM_K_MAX = 16
_SUM_OUT_MAX = 1 << 16
_SUM_TMP_MAX = 1 << 24

# Trace-time gate for the mul+sum lowerings — a diagnostic escape
# hatch, nothing disables it in production.  It was added while
# bisecting the axon-worker deaths in the FEAST/RT batched shifted
# solves (vmap(while(while)) programs); probe_q_bisect exonerated the
# lowering (every orthogonalisation/sigma variant died the same way)
# and probe_q_compile pinned the deaths on the worker's ~11-min compile
# watchdog, mitigated by chunking dispatches (max_nodes_per_dispatch).
# Kept so future HLO-pattern bisects can flip one switch.
_MULSUM_ENABLED = True


class no_mulsum:
    """Context manager: force plain einsum lowering for skinny
    contractions traced inside the ``with`` block."""

    def __enter__(self):
        global _MULSUM_ENABLED
        self._prev = _MULSUM_ENABLED
        _MULSUM_ENABLED = False
        return self

    def __exit__(self, *exc):
        global _MULSUM_ENABLED
        _MULSUM_ENABLED = self._prev
        return False


def parse_mode(mode):
    """Validate a mode string; return (n_slices, t_cutoff) or None for xla."""
    if mode == "xla":
        return None
    if mode == "ozaki":
        return 9, 9
    parts = mode.split(":")
    if len(parts) == 3 and parts[0] == "ozaki":
        return int(parts[1]), int(parts[2])
    raise ValueError(
        f"contract mode must be 'xla', 'ozaki' or 'ozaki:S:T', got {mode!r}")


def set_mode(mode):
    global _MODE
    parse_mode(mode)
    _MODE = mode


def get_mode():
    return _MODE


def _shape_stats(spec, a, b):
    sa, sb, out, batch, fa, fb, con, dim = ozaki._plan(spec, a.shape,
                                                       b.shape)
    k = int(np.prod([dim[c] for c in con], initial=1))
    flops = 2 * int(np.prod([dim[c] for c in set(sa + sb)], initial=1))
    out_elems = int(np.prod([dim[c] for c in out], initial=1))
    return k, flops, out_elems


def _mulsum(spec, a, b):
    """Broadcast mul+sum lowering of a single-contraction einsum (for the
    skinny shapes XLA's emulated-f64 dot mishandles; gate in
    :func:`contract`).  Short contracted axes unroll into K broadcast
    FMAs (temporary = one output buffer); otherwise one broadcast product
    is reduced over the contracted axes."""
    sa, sb, out, batch, fa, fb, con, dim = ozaki._plan(spec, a.shape,
                                                       b.shape)
    order = out + "".join(con)
    a_t = jnp.transpose(a, [sa.index(c) for c in order if c in sa])
    b_t = jnp.transpose(b, [sb.index(c) for c in order if c in sb])
    k = int(np.prod([dim[c] for c in con], initial=1))
    if k <= _SUM_K_MAX:
        a_t = a_t.reshape([dim[c] if c in sa else 1 for c in out] + [k])
        b_t = b_t.reshape([dim[c] if c in sb else 1 for c in out] + [k])
        acc = None
        for i in range(k):
            t = a_t[..., i] * b_t[..., i]
            acc = t if acc is None else acc + t
        return acc
    a_t = a_t.reshape([dim[c] if c in sa else 1 for c in out]
                      + [dim[c] for c in con])
    b_t = b_t.reshape([dim[c] if c in sb else 1 for c in out]
                      + [dim[c] for c in con])
    n_out = len(out)
    return (a_t * b_t).sum(axis=tuple(range(n_out, n_out + len(con))))


def contract(spec, a, b, mode=None):
    """``jnp.einsum(spec, a, b)`` through the selected precision backend."""
    opts = parse_mode(_MODE if mode is None else mode)
    if a.dtype == jnp.float64 and b.dtype == jnp.float64:
        k, flops, out_elems = _shape_stats(spec, a, b)
        if opts is not None and k >= _MIN_K and flops >= _MIN_FLOPS:
            return ozaki.einsum2(spec, a, b, n_slices=opts[0],
                                 t_cutoff=opts[1])
        if _MULSUM_ENABLED and (
                k <= _SUM_K_MAX or (out_elems <= _SUM_OUT_MAX
                                    and flops // 2 <= _SUM_TMP_MAX)):
            return _mulsum(spec, a, b)
    return jnp.einsum(spec, a, b)
