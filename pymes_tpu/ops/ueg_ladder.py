"""Matrix-free particle-particle ladder for the UEG.

The UEG two-body integrals carry momentum-conservation structure:
``V[a,b,c,d] = w(k_c − k_a) · δ(k_a + k_b = k_c + k_d)`` where w is the
(p,r)-only weight of the integral class (Coulomb 4π/q²/Ω, or any of the
hermitian TC classes — everything except the non-hermitian rs-dependent
term).  The pp-ladder contraction therefore collapses from a dense
O(nv⁴·no²) matmul over an nv⁴ tensor (16 GB at nP=219!) to

``R_abij = Σ_q w(q) · T[c(a,q), d(b,q), i, j]``

a weighted gather-sum over the ~nq distinct momentum transfers —
O(nq·nv²·no²) flops and **no nv⁴ storage**.  This is the TPU-first design
the reference's dense CTF contraction cannot reach: the loop over q is a
``lax.scan`` of masked gathers, bandwidth-bound on the (small) T2 tensor.

Exact against the dense ladder for the generated integral classes
(``tests/test_ueg_ladder.py``).
"""

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


class UEGLadder(NamedTuple):
    """Precomputed gather plan: for each transfer q, the virtual-orbital
    images c(a,q), d(b,q) (−1 = leaves the basis) and the weight w(q)."""

    C: jnp.ndarray   # (nq, nv) int32
    D: jnp.ndarray   # (nq, nv) int32
    w: jnp.ndarray   # (nq,) float


def _transfer_weights(ueg_model, q_vecs, correlator=None, **integral_flags):
    """w(q) for the transfer-only integral classes (Coulomb, RPA-approx,
    hermitian-TC) on integer transfer vectors ``q_vecs`` (n, 3)."""
    from pymes_tpu.models.ueg import _call_correlator

    qp = q_vecs * 2.0 * np.pi / ueg_model.L
    q2 = np.einsum("nx,nx->n", qp, qp)
    with np.errstate(divide="ignore"):
        coul = np.where(q2 > 0, 4.0 * np.pi / np.where(q2 > 0, q2, 1.0),
                        0.0)
    if correlator is None and not integral_flags:
        return coul / ueg_model.Omega
    if integral_flags.get("is_rpa_approx"):
        u = _call_correlator(correlator, q2, scalar_path=True)
        return np.where(
            q2 > 0, -ueg_model.n_ele * q2 * u ** 2 / ueg_model.Omega ** 2,
            0.0)
    if integral_flags.get("is_only_hermi_2b"):
        # Coulomb + Σ∇u·∇u convolution + q²u(q²): all transfer-only
        u = _call_correlator(correlator, q2, scalar_path=True)
        ueg_model.correlator = correlator
        u_mat = ueg_model._sum_nabla_u_squared(
            q_vecs.reshape(-1, 1, 3), None).reshape(-1)
        return np.where(q2 > 0, (coul + u_mat + q2 * u) / ueg_model.Omega,
                        u_mat / ueg_model.Omega)
    raise NotImplementedError(
        "matrix-free plans support the Coulomb, RPA-approx and "
        "hermitian-TC integral classes (transfer-only weights); the "
        "non-hermitian class depends on (r, s) and needs the dense block")


class OVVVPlan(NamedTuple):
    """Gather plan for ``out[p,q,r,j] = Σ_s V[p,q,r,s] T1[s,j]`` on a
    momentum-structured block whose LAST axis is virtual.

    ``V[p,q,r,s] = w(k_r − k_p) δ(k_p+k_q = k_r+k_s)`` fixes s given
    (p,q,r): ``S[p,q,r]`` is its virtual index (−1 = outside the basis)
    and ``W[p,r] = w(k_r − k_p)``.  This removes every nv³no-sized ovvv
    block from the matrix-free CCSD path — their only uses contract a T1
    factor first (VERDICT r1 task 6: three resident ovvv blocks plus
    XLA's emulated-f64 split temporaries OOM'd nP=219)."""

    S: jnp.ndarray   # (n0, n1, n2) int32 — virtual index of k_p+k_q−k_r
    W: jnp.ndarray   # (n0, n2) float — w(k_r − k_p)


def build_ovvv_t1_plan(ueg_model, ranges, correlator=None,
                       dtype=np.float64, **integral_flags):
    """Build an :class:`OVVVPlan` for leading-axis orbital ``ranges``
    (3-char string of 'o'/'v'/'a'); the contracted 4th axis is virtual."""
    no = ueg_model.n_ele // 2
    n_p = ueg_model.n_spatial
    k_int = ueg_model.basis.k_int
    sel = {"o": k_int[:no], "v": k_int[no:], "a": k_int}
    k0, k1, k2 = (sel[c] for c in ranges)

    ksum = (k0[:, None, None, :] + k1[None, :, None, :]
            - k2[None, None, :, :])
    S = ueg_model._lookup_flat(ksum)
    S = np.where(S >= no, S - no, -1)

    d = (k2[None, :, :] - k0[:, None, :]).reshape(-1, 3)
    q_vecs, inv = np.unique(d, axis=0, return_inverse=True)
    w = _transfer_weights(ueg_model, q_vecs, correlator, **integral_flags)
    W = w[inv].reshape(len(k0), len(k2))
    return OVVVPlan(S=jnp.asarray(S, dtype=jnp.int32),
                    W=jnp.asarray(W, dtype=dtype))


def ovvv_t1_apply(plan: OVVVPlan, T1):
    """``out[p,q,r,j] = Σ_s V[p,q,r,s] T1[s,j]`` via the gather plan."""
    T1 = jnp.asarray(T1)
    nv = T1.shape[0]
    Tg = T1[jnp.clip(plan.S, 0, nv - 1)]          # (n0, n1, n2, no)
    Tg = jnp.where((plan.S >= 0)[..., None], Tg, 0.0)
    return Tg * plan.W[:, None, :, None]


def build_ueg_ladder(ueg_model, correlator=None, dtype=np.float64,
                     bra="virtual", **integral_flags):
    """Build the ladder plan from a UEG model.

    The weights are taken from the same vectorized integral engine as the
    dense path (so every (p,r)-structured integral class is supported);
    transfers with all-invalid images are pruned.

    ``bra="virtual"`` builds the plain pp-ladder plan (images of virtual
    orbitals); ``bra="all"`` spans all orbitals on the bra side — the plan
    needed for the T1-*dressed* ladder of CCSD
    (:func:`dressed_ladder_apply`), whose W intermediate carries occupied
    bra indices.
    """
    no = ueg_model.n_ele // 2
    n_p = ueg_model.n_spatial
    nv = n_p - no
    k_int = ueg_model.basis.k_int
    k_bra = k_int if bra == "all" else k_int[no:]

    # distinct transfers q = k_c − k_p over (bra, virtual) pairs
    d_int = (k_int[None, no:, :] - k_bra[:, None, :]).reshape(-1, 3)
    q_vecs, _ = np.unique(d_int, axis=0, return_inverse=True)

    # weights from the integral engine: transfer-only for the supported
    # classes (shared with the ovvv-gather plans)
    w = _transfer_weights(ueg_model, q_vecs, correlator, **integral_flags)

    # gather images: c(p, q) = lookup(k_p + q) − no (virtual index), and
    # d(p', q) = lookup(k_p' − q) − no
    C = ueg_model._lookup_flat(k_bra[None, :, :] + q_vecs[:, None, :])
    D = ueg_model._lookup_flat(k_bra[None, :, :] - q_vecs[:, None, :])
    C = np.where(C >= no, C - no, -1)     # images must be virtual (c, d)
    D = np.where(D >= no, D - no, -1)

    keep = ~((C < 0).all(axis=1) | (D < 0).all(axis=1) | (w == 0.0))
    return UEGLadder(C=jnp.asarray(C[keep], dtype=jnp.int32),
                     D=jnp.asarray(D[keep], dtype=jnp.int32),
                     w=jnp.asarray(w[keep], dtype=dtype))


def ueg_ladder_apply(ladder: UEGLadder, T_abij, chunk=1):
    """R_abij = Σ_q w(q) T[c(a,q), d(b,q), i, j] via a scan over chunks of
    transfers, each chunk a vmapped masked gather.

    Measured on v5e: the op is gather-bandwidth-bound, so chunking does not
    help (chunk=8 was within noise at nP=219 and ~20% slower at nP=389);
    the default stays at the simple per-q scan."""
    T_abij = jnp.asarray(T_abij)
    nv = T_abij.shape[0]
    nq = ladder.w.shape[0]
    pad = (-nq) % chunk
    w = jnp.pad(ladder.w, (0, pad))
    C = jnp.pad(ladder.C, ((0, pad), (0, 0)), constant_values=-1)
    D = jnp.pad(ladder.D, ((0, pad), (0, 0)), constant_values=-1)
    n_bra = ladder.C.shape[1]
    w = w.reshape(-1, chunk)
    C = C.reshape(-1, chunk, n_bra)
    D = D.reshape(-1, chunk, n_bra)

    def one_q(w_q, c_q, d_q):
        valid = ((c_q >= 0)[:, None] & (d_q >= 0)[None, :])
        Tg = T_abij[jnp.clip(c_q, 0, nv - 1)][:, jnp.clip(d_q, 0, nv - 1)]
        return w_q * jnp.where(valid[:, :, None, None], Tg, 0.0)

    def step(acc, qcd):
        w_c, c_c, d_c = qcd
        contrib = jax.vmap(one_q)(w_c, c_c, d_c)
        return acc + contrib.sum(axis=0), None

    # output bra dims follow the plan (nv for the plain ladder, nb for the
    # all-bra plan of the dressed ladder)
    out_shape = (C.shape[-1], D.shape[-1]) + T_abij.shape[2:]
    acc0 = jnp.zeros(out_shape, T_abij.dtype)
    out, _ = jax.lax.scan(step, acc0, (w, C, D))
    return out


def ueg_ladder_apply_ij(ladder: UEGLadder, T_ijab, chunk=1):
    """Occupied-leading variant: ``R_ijab = Σ_q w(q) T[i,j,c(a,q),d(b,q)]``.

    Same math as :func:`ueg_ladder_apply` with T2 carried as
    ``T[i,j,a,b]`` — the TPU-friendly tiling (trailing axes virtual, so
    the per-step accumulator pads ~1.1× instead of ~19× under the (8,128)
    lane tiling; see ``benchmarks/probe_h_layout.py``)."""
    T = jnp.asarray(T_ijab)
    nv = T.shape[-1]
    nq = ladder.w.shape[0]
    pad = (-nq) % chunk
    w = jnp.pad(ladder.w, (0, pad)).reshape(-1, chunk)
    n_bra = ladder.C.shape[1]
    C = jnp.pad(ladder.C, ((0, pad), (0, 0)),
                constant_values=-1).reshape(-1, chunk, n_bra)
    D = jnp.pad(ladder.D, ((0, pad), (0, 0)),
                constant_values=-1).reshape(-1, chunk, n_bra)

    def one_q(w_q, c_q, d_q):
        valid = (c_q >= 0)[:, None] & (d_q >= 0)[None, :]
        Tg = T[:, :, jnp.clip(c_q, 0, nv - 1), :]
        Tg = Tg[:, :, :, jnp.clip(d_q, 0, nv - 1)]
        return w_q * jnp.where(valid[None, None], Tg, 0.0)

    def step(acc, qcd):
        w_c, c_c, d_c = qcd
        return acc + jax.vmap(one_q)(w_c, c_c, d_c).sum(axis=0), None

    out_shape = T.shape[:2] + (n_bra, n_bra)
    acc0 = jnp.zeros(out_shape, T.dtype)
    out, _ = jax.lax.scan(step, acc0, (w, C, D))
    return out


def build_ovvv_plans(ueg_model, correlator=None, dtype=np.float64,
                     **integral_flags):
    """The three ovvv gather plans the matrix-free CCSD dressing needs
    (leading-range patterns vvo/ovv/vov), keyed for
    ``dict_t_V["_ovvv_plans"]``."""
    return {pat: build_ovvv_t1_plan(ueg_model, pat, correlator,
                                    dtype=dtype, **integral_flags)
            for pat in ("vvo", "ovv", "vov")}


def dressed_ladder_apply_ij(ladder_all: UEGLadder, T_ai, T_ijab, no,
                            W=None):
    """Occupied-leading variant of :func:`dressed_ladder_apply`:
    ``R_ijab = Σ_cd V̄_abcd T_cdij`` with T2 and the result carried as
    ``[i,j,a,b]`` and the all-bra W as ``W[i,j,p,q]``."""
    if W is None:
        W = ueg_ladder_apply_ij(ladder_all, T_ijab)
    W_vv = W[:, :, no:, no:]
    W_ov = W[:, :, :no, no:]
    W_vo = W[:, :, no:, :no]
    W_oo = W[:, :, :no, :no]
    T1 = jnp.asarray(T_ai)
    R = W_vv
    R = R - jnp.einsum("ak,ijkb->ijab", T1, W_ov)
    R = R - jnp.einsum("bl,ijal->ijab", T1, W_vo)
    R = R + jnp.einsum("ak,bl,ijkl->ijab", T1, T1, W_oo)
    return R


def dressed_ladder_apply(ladder_all: UEGLadder, T_ai, T_abij, no, W=None):
    """T1-dressed ladder  R_abij = Σ_cd V̄_abcd T_cdij  without building
    V̄_abcd: the bra dressing is rank-1 (Λ = I − T̂, ccsd formalism), so

    ``R = W[v,v] − T1·W[o,v] − W[v,o]·T1 + T1·W[o,o]·T1``

    with ``W_pqij = Σ_cd V_pqcd T_cdij`` from the all-bra gather plan
    (the ket dressing is the identity on the all-virtual ket of abcd).
    ``W`` may be precomputed by the caller (the CCSD iteration reuses it
    for the singles residual).
    """
    if W is None:
        W = ueg_ladder_apply(ladder_all, T_abij)
    W_vv = W[no:, no:]
    W_ov = W[:no, no:]
    W_vo = W[no:, :no]
    W_oo = W[:no, :no]
    T1 = jnp.asarray(T_ai)
    R = W_vv
    R = R - jnp.einsum("ak,kbij->abij", T1, W_ov)
    R = R - jnp.einsum("bl,alij->abij", T1, W_vo)
    R = R + jnp.einsum("ak,bl,klij->abij", T1, T1, W_oo)
    return R
