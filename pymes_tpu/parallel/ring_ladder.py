"""Ring-accumulated particle-particle ladder over a device mesh.

The dense ladder ``R_abij = Σ_cd V_abcd T_cdij`` with V row-sharded on the
output axis *a* and T2 sharded on the contraction axis *c*: instead of
all-gathering T2 onto every device, each device contracts the T-shard it
currently holds with the matching c-slice of its local V block and passes
the shard to its ring neighbour (``lax.ppermute``) — P steps see all
shards, communication overlaps compute, peak memory stays at one T-shard.

This is the CC analogue of ring attention over the virtual-orbital axis
(SURVEY §5.7) and the explicit-collective counterpart of the GSPMD path
used by the solvers.  :func:`ring_ladder_inside` is the jit-composable
form used *inside* the solver while_loop (``ccd_solve_jit(...,
ring_mesh=...)``), replacing CTF's distributed contraction of the same
term (``pymes/solver/ccd.py:187``); exactness vs the dense contraction is
tested on the virtual CPU mesh (``tests/test_parallel.py``).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def _ring_kernel(V_loc, T_loc, *, axis, n_dev, csz):
    me = jax.lax.axis_index(axis)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def step(k, carry):
        T_held, R = carry
        # the shard currently held started on device (me - k) mod P
        src = (me - k) % n_dev
        V_slice = jax.lax.dynamic_slice_in_dim(V_loc, src * csz, csz,
                                               axis=2)
        R = R + jnp.einsum("abcd,cdij->abij", V_slice, T_held)
        T_held = jax.lax.ppermute(T_held, axis, perm)
        return T_held, R

    R0 = jax.lax.pcast(
        jnp.zeros(V_loc.shape[:1] + T_loc.shape[1:], T_loc.dtype), axis,
        to="varying")
    _, R = jax.lax.fori_loop(0, n_dev, step, (T_loc, R0))
    return R


def ring_ladder_inside(V_abcd, T_cdij, mesh, axis="a"):
    """Jit-composable ring ladder: both operands sharded on axis 0 over
    ``mesh[axis]`` (GSPMD rechunks if they are not); result sharded like V.
    Safe to call inside a jitted ``lax.while_loop`` body.
    """
    n_dev = mesh.shape[axis]
    nv = T_cdij.shape[0]
    if nv % n_dev:
        raise ValueError(f"nv={nv} must divide the mesh axis ({n_dev})")
    csz = nv // n_dev
    kernel = partial(_ring_kernel, axis=axis, n_dev=n_dev, csz=csz)
    return jax.shard_map(kernel, mesh=mesh, in_specs=(P(axis), P(axis)),
                         out_specs=P(axis))(V_abcd, T_cdij)


def ring_ladder(V_abcd, T_cdij, mesh, axis="a"):
    """Standalone form: device_put the operands, then ring-contract."""
    V_sh = jax.device_put(V_abcd, NamedSharding(mesh, P(axis)))
    T_sh = jax.device_put(T_cdij, NamedSharding(mesh, P(axis)))
    return ring_ladder_inside(V_sh, T_sh, mesh, axis)
