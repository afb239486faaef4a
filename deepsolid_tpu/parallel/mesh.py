"""Device-mesh data parallelism over walkers (TPU-native collectives).

The reference replicates everything with `pmap` over one axis
(DeepSolid/constants.py:26-57). Here the equivalent is a
`jax.sharding.Mesh` with a 'data' axis: walker batches are sharded over
it, parameters/optimizer state replicated, statistics reduced with psum
over ICI. Training steps run under `shard_map` (collectives explicit) and
compose with jit.

`pmean_if_axis`/`psum_if_axis` mirror the reference's pmean_if_pmap trick
(constants.py:44-51): the same code runs inside shard_map (axis bound) or
under plain jit (axis unbound, reduction is a no-op).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
DERIV_AXIS = "deriv"


def local_mesh(n: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """A 1-D mesh over (the first n) local devices."""
    devices = np.asarray(jax.devices() if n is None else jax.devices()[:n])
    return Mesh(devices, (axis,))


def make_mesh(deriv_devices: int = 1) -> Mesh:
    """The production mesh: ('data',) or ('data', 'deriv').

    With deriv_devices > 1 the 3N Laplacian tangent columns of the
    forward engine shard over the trailing 'deriv' axis (the workload's
    analog of sequence/context parallelism, SURVEY.md §5) while walkers
    shard over 'data'. deriv ranks hold identical walkers/params: the VMC
    gradient estimator differentiates only the (replicated) forward pass,
    so no cross-deriv gradient reduction is needed — the jets psum their
    cross-tangent contractions internally.
    """
    devices = jax.devices()
    if deriv_devices <= 1:
        return Mesh(np.asarray(devices), (DATA_AXIS,))
    if len(devices) % deriv_devices != 0:
        raise ValueError(
            f"parallel.deriv_devices={deriv_devices} must divide the "
            f"device count ({len(devices)})"
        )
    grid = np.asarray(devices).reshape(-1, deriv_devices)
    return Mesh(grid, (DATA_AXIS, DERIV_AXIS))


def pmean_if_axis(x, axis: str = DATA_AXIS):
    """lax.pmean when `axis` is bound (inside shard_map/pmap); identity else."""
    try:
        return jax.lax.pmean(x, axis_name=axis)
    except NameError:
        return x


def psum_if_axis(x, axis: str = DATA_AXIS):
    try:
        return jax.lax.psum(x, axis_name=axis)
    except NameError:
        return x


def all_mean(tree, axis: str = DATA_AXIS):
    """pmean over a whole pytree (if the axis is bound)."""
    return jax.tree_util.tree_map(lambda v: pmean_if_axis(v, axis), tree)


def all_sum(tree, axis: str = DATA_AXIS):
    return jax.tree_util.tree_map(lambda v: psum_if_axis(v, axis), tree)


def shard_leading(mesh: Mesh, x, axis: str = DATA_AXIS):
    """Shard array(s) along the leading dim over the mesh axis."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda v: jax.device_put(v, sharding), x
    )


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda v: jax.device_put(v, sharding), tree)
