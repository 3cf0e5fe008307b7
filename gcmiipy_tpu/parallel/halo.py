"""Halo exchange primitives for shard_map domain decomposition.

The reference's ``np.roll`` periodic stencils become, under a 2D (lat x lon)
device mesh, width-h halo exchanges over ICI via ``jax.lax.ppermute``
(SURVEY.md section 2.9).  Periodicity is the ring topology itself: the halo
a shard receives from its ring neighbor IS the wrapped boundary.

All functions run inside ``shard_map`` bodies.
"""

import jax
import jax.numpy as jnp


def _ring(axis_name, shift):
    """ppermute permutation for a ring shift by ``shift`` source->dest."""
    n = jax.lax.axis_size(axis_name)
    return [(i, (i + shift) % n) for i in range(n)]


def exchange_axis(x, halo, axis_name, axis):
    """Pad ``x`` with ``halo`` cells from ring neighbors along one axis.

    Returns x padded from size S to S + 2*halo along ``axis``: leading pad
    comes from the left (lower-index) neighbor's trailing cells, trailing pad
    from the right neighbor's leading cells — exactly the cells a periodic
    roll would reach across the shard boundary.
    """
    size = x.shape[axis]
    if halo > size:
        raise ValueError(f"halo {halo} exceeds local extent {size}")
    lead = jax.lax.slice_in_dim(x, 0, halo, axis=axis)
    trail = jax.lax.slice_in_dim(x, size - halo, size, axis=axis)
    # my leading pad = left neighbor's trailing cells: they send "trail"
    # forward (+1); my trailing pad = right neighbor's leading cells (-1)
    from_left = jax.lax.ppermute(trail, axis_name, _ring(axis_name, 1))
    from_right = jax.lax.ppermute(lead, axis_name, _ring(axis_name, -1))
    return jnp.concatenate([from_left, x, from_right], axis=axis)


def exchange_2d(x, halo, y_axis_name="y", x_axis_name="x",
                y_axis=-2, x_axis=-1):
    """Pad both spatial axes (lat then lon).  Corner cells become valid
    because the second exchange transports the already-padded rows."""
    x = exchange_axis(x, halo, y_axis_name, y_axis)
    return exchange_axis(x, halo, x_axis_name, x_axis)


def trim(x, halo, axes=(-2, -1)):
    """Remove halo padding along ``axes``."""
    for axis in axes:
        x = jax.lax.slice_in_dim(x, halo, x.shape[axis] - halo, axis=axis)
    return x
