"""Device GMRES (no custom_linear_solve): accuracy vs dense solve, and
operation inside matvecs built from non-linear primitives (the integer-
MXU Ozaki path), which jax.scipy's gmres rejects."""

import jax
import jax.numpy as jnp
import numpy as np

from pymes_tpu.ops.gmres import gmres


def _system(n, seed=0):
    rng = np.random.default_rng(seed)
    A = np.eye(n) * 4.0 + rng.standard_normal((n, n)) * 0.3
    b = rng.standard_normal(n)
    return A, b


def test_gmres_matches_dense_solve():
    A, b = _system(60)
    x_ref = np.linalg.solve(A, b)
    Aj = jnp.asarray(A)
    x, rel = gmres(lambda v: Aj @ v, jnp.asarray(b), tol=1e-12,
                   restart=20, max_outer=50)
    assert float(rel) < 1e-10
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-8)


def test_gmres_preconditioned():
    A, b = _system(80, seed=1)
    d = jnp.asarray(1.0 / np.diag(A))
    Aj = jnp.asarray(A)
    x, rel = gmres(lambda v: Aj @ v, jnp.asarray(b),
                   precond=lambda v: d * v, tol=1e-12, restart=15,
                   max_outer=60)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                               atol=1e-8)


def test_gmres_with_ozaki_matvec():
    """The matvec runs through ozaki.matmul (trunc/bitcast primitives) —
    jax.scipy.sparse.linalg.gmres raises inside custom_linear_solve on
    this operator; ours just calls it."""
    from pymes_tpu.ops import ozaki
    A, b = _system(64, seed=2)
    Aj = jnp.asarray(A)

    def mv(v):
        return ozaki.matmul(Aj, v[:, None], n_slices=9, t_cutoff=9)[:, 0]

    x, rel = gmres(mv, jnp.asarray(b), tol=1e-11, restart=20,
                   max_outer=50)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                               atol=1e-7)
