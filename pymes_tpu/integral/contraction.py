"""Contractions of the transcorrelated 3-body tensor L.

Produces the effective 2-body integrals (single contraction), 1-body energy
corrections (double contraction) and the scalar energy shift (triple
contraction) from the 6-index L tensor, with the same diagram factors as the
reference (``pymes/integral/contraction.py:17,40,68``).  The 3-body operator
is ``−L^{opq}_{rst}`` and the tensor uses the chemists' *pair-interleaved*
storage layout of :mod:`pymes_tpu.util.tcdump`: axes (o, r, p, s, q, t) with
electron pairs (o,r), (p,s), (q,t).

Each contraction is a handful of dense einsums over occupied slots — XLA
turns these traces into gathers + matmuls on device; inputs may be numpy or
jax arrays.
"""

import numpy as np

from pymes_tpu.log import print_logging_info


def get_single_contraction(no, t_L_orpsqt):
    """Effective 2-body integrals D_pqrs from one occupied contraction.

    Diagram factors (hole lines, loops, equivalent diagrams, spin) follow
    ``contraction.py:30-37``; the result is symmetrised over the two
    electrons and carries the overall −1/3 of the −L/3 convention.
    """
    nb = t_L_orpsqt.shape[0]
    xp = np
    t_D_pqrs = xp.zeros([nb, nb, nb, nb], dtype=t_L_orpsqt.dtype)
    # exchange-type: 1 hole line, 0 loops, sign −1, 3·2 equivalent diagrams
    t_D_pqrs += -3.0 * 2.0 * np.einsum(
        "pqriis->prqs", t_L_orpsqt[:, :, :, :no, :no, :])
    t_D_pqrs += -3.0 * 2.0 * np.einsum(
        "rspiiq->prqs", t_L_orpsqt[:, :, :, :no, :no, :])
    t_D_pqrs /= 2.0
    # direct (RPA)-type: 1 hole line, 1 loop, sign +1, 3 diagrams, spin 2
    t_D_pqrs += 2.0 * 3.0 * np.einsum(
        "pqrsii->prqs", t_L_orpsqt[:, :, :, :, :no, :no])
    return -t_D_pqrs / 3.0


def get_double_contraction(no, t_L_orpsqt):
    """1-body corrections S_pq from two occupied contractions
    (``contraction.py:40``)."""
    t_S_pq = 2.0 ** 2 * 3.0 * np.einsum(
        "iijjpq->pq", t_L_orpsqt[:no, :no, :no, :no, :, :])
    t_S_pq += -(2.0 ** 1) * 3.0 * 2.0 * np.einsum(
        "iipjjq->pq", t_L_orpsqt[:no, :no, :, :no, :no, :])
    t_S_pq += 3.0 * 2.0 * np.einsum(
        "pijqij->pq", t_L_orpsqt[:, :no, :no, :, :no, :no])
    t_S_pq += -1.0 * 3.0 * 2.0 * np.einsum(
        "ijjipq->pq", t_L_orpsqt[:no, :no, :no, :no, :, :])
    return -t_S_pq / 6.0


def get_triple_contraction(no, t_L_orpsqt):
    """Scalar energy shift T_0 from three occupied contractions
    (``contraction.py:68``)."""
    print_logging_info("Triple contraction")
    L_occ = t_L_orpsqt[:no, :no, :no, :no, :no, :no]
    t_T_0 = 2.0 ** 3 * np.einsum("iijjkk->", L_occ)
    t_T_0 += -(2 ** 2) * 3.0 * np.einsum("ijjikk->", L_occ)
    t_T_0 += 2.0 * 2.0 * np.einsum("ijjkki->", L_occ)
    return -t_T_0 / 6.0
