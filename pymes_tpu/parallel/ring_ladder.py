"""Ring-accumulated particle-particle ladder over a device mesh.

The dense ladder ``R_abij = Σ_cd V_abcd T_cdij`` with V row-sharded on the
output axis *a* and T2 sharded on the contraction axis *c*: instead of
all-gathering T2 onto every device, each device contracts the T-shard it
currently holds with the matching c-slice of its local V block and passes
the shard to its ring neighbour (``lax.ppermute``) — P steps see all
shards, communication overlaps compute, peak memory stays at one T-shard.

This is the CC analogue of ring attention over the virtual-orbital axis
(SURVEY §5.7) and the explicit-collective counterpart of the GSPMD path
used by the solvers; exactness vs the dense contraction is tested on the
virtual CPU mesh (``tests/test_parallel.py``).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def ring_ladder(V_abcd, T_cdij, mesh, axis="a"):
    """Compute R_abij with V sharded on axis 0 and T on axis 0 over
    ``mesh[axis]``; returns R sharded like V.  Shapes must divide the mesh.
    """
    n_dev = mesh.shape[axis]
    nv = T_cdij.shape[0]
    csz = nv // n_dev

    V_sh = jax.device_put(V_abcd, NamedSharding(mesh, P(axis)))
    T_sh = jax.device_put(T_cdij, NamedSharding(mesh, P(axis)))

    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
             out_specs=P(axis))
    def kernel(V_loc, T_loc):
        me = jax.lax.axis_index(axis)

        def step(k, carry):
            T_held, R = carry
            # the shard currently held started on device (me - k) mod P
            src = (me - k) % n_dev
            V_slice = jax.lax.dynamic_slice_in_dim(V_loc, src * csz, csz,
                                                   axis=2)
            R = R + jnp.einsum("abcd,cdij->abij", V_slice, T_held)
            T_held = jax.lax.ppermute(T_held, axis, perm)
            return T_held, R

        R0 = jax.lax.pvary(
            jnp.zeros(V_loc.shape[:1] + T_loc.shape[1:], T_loc.dtype),
            axis)
        _, R = jax.lax.fori_loop(0, n_dev, step, (T_loc, R0))
        return R

    return kernel(V_sh, T_sh)
