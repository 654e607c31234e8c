"""Device-mesh utilities for multi-chip execution.

The workload's free parallel axes (SURVEY.md §5) are batch-like — sequences,
methods, sweep configs — plus within-frame spatial math. We expose:

  * ``dp``  — data parallel over the batch of sequences/work units
  * ``sp``  — spatial parallel over image width (XLA inserts the conv halo
              exchanges automatically under GSPMD)
  * ``tp``  — tensor parallel over conv output channels for the widest layers
              (used by the training step's parameter sharding rule)

No hand-written collectives are needed: work units are embarrassingly
parallel and reductions are scalar scores on host; inside a step, GSPMD
derives the psum/halo traffic from the sharding annotations.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axes=("dp", "sp"), devices=None):
    """Create a Mesh over the first n devices with the given axis names.
    The dp axis takes the largest factor; sp gets the remainder."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if len(axes) == 1:
        shape = (n,)
    else:
        # one factor of 2 to each non-dp axis, but only while dp would keep
        # at least an equal share — dp (the batch axis) must never end up
        # smaller than the axes it feeds: 2 devices -> (2,1,1),
        # 4 -> (2,2,1), 8 -> (2,2,2), 16 -> (4,2,2)
        shape = [1] * len(axes)
        m = n
        for i in range(1, len(axes)):
            if m % 2 == 0 and m // 2 >= 2:
                shape[i] = 2
                m //= 2
        shape[0] = m
        shape = tuple(shape)
    mesh_devices = np.array(devices).reshape(shape)
    return Mesh(mesh_devices, axes)


def batch_sharding(mesh, ndim, batch_axis=0, width_axis=None):
    """NamedSharding: batch dim over 'dp', optional spatial dim over 'sp'."""
    spec = [None] * ndim
    spec[batch_axis] = "dp"
    if width_axis is not None and "sp" in mesh.axis_names:
        spec[width_axis] = "sp"
    return NamedSharding(mesh, P(*spec))


def shard_params(mesh, params, tp_axis="tp", min_channels=64):
    """Shard conv kernels' output-channel dim over tp (if present in the
    mesh) when wide enough; replicate everything else."""
    have_tp = tp_axis in mesh.axis_names
    tp = mesh.shape[tp_axis] if have_tp else 1

    def spec_for(x):
        if (have_tp and tp > 1 and getattr(x, "ndim", 0) == 4
                and x.shape[-1] >= min_channels and x.shape[-1] % tp == 0):
            return NamedSharding(mesh, P(None, None, None, tp_axis))
        return NamedSharding(mesh, P())

    return jax.tree.map(lambda x: jax.device_put(x, spec_for(x)), params)
