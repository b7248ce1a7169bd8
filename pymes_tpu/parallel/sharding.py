"""Sharding helpers for embarrassingly parallel fan-outs.

``shard_over_nodes`` distributes the *leading* axis of a batch of
independent work items — FEAST quadrature nodes, twist-average k-shifts,
trial vectors — over a mesh axis, so a ``vmap``-ed solve runs one item
per device with zero communication.  This is the device-mesh counterpart
of the reference's joblib process fan-out over contour nodes
(``pymes/solver/feast_eom_rccsd.py:90-108``).
"""

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_over_nodes(tree, mesh, axis="a"):
    """device_put every array leaf with its leading axis sharded over
    ``mesh[axis]``; leaves whose leading dimension does not divide the
    mesh axis (or scalars) are replicated."""
    n_dev = mesh.shape[axis]

    def put(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] % n_dev == 0:
            spec = P(axis, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(tree, mesh):
    """device_put every leaf fully replicated over the mesh."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def node_mesh(n_devices=None, axis="n"):
    """1D mesh over all (or the first n) devices for node fan-out."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np
    return Mesh(np.asarray(devices), (axis,))
