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


def exchange_pad_aligned(x, ex, pad_j, pad_x,
                         y_axis_name="y", x_axis_name="x"):
    """Exchange depth-``ex`` 2D halos and embed into a zero-filled
    ``(pad_j, pad_x)``-deep alignment pad in ONE buffer build.

    TPU layout matters here: concatenating 3-cell halos onto a field
    (:func:`exchange_2d`) materializes lane/sublane-MISALIGNED widths
    (e.g. 1030), and every downstream op pays relayout copies — measured
    30-70x slowdowns on v5e.  This form keeps the big buffer aligned:
    the core lands at offset ``(pad_j, pad_x)`` (multiples of 8/128 by
    construction of the padded-state layout) via an aligned
    dynamic_update_slice, and only the TINY ex-deep halo strips are
    odd-offset writes.  Cells beyond depth ``ex`` stay zero — valid for
    consumers whose stencil reach is <= ex.

    Corner cells are valid: the x strips are cut from the already
    y-padded row range.

    Size-1 mesh axes short-circuit: when both axes are unsharded the
    periodic halo IS the local wrap, and a single ``jnp.pad(mode="wrap")``
    (valid to FULL pad depth) measures ~25% faster than the strip-write
    form on v5e; mixed cases keep the strip path (ppermute with a size-1
    ring is a self-copy, which XLA elides).
    """
    if (jax.lax.axis_size(y_axis_name) == 1
            and jax.lax.axis_size(x_axis_name) == 1):
        return jnp.pad(x, [(0, 0)] * (x.ndim - 2)
                       + [(pad_j, pad_j), (pad_x, pad_x)], mode="wrap")
    lead = x.ndim - 2
    Hl, Wl = x.shape[-2], x.shape[-1]
    Hp, Wp = Hl + 2 * pad_j, Wl + 2 * pad_x
    zidx = (0,) * lead
    out = jnp.zeros(x.shape[:-2] + (Hp, Wp), x.dtype)
    out = jax.lax.dynamic_update_slice(out, x, zidx + (pad_j, pad_x))
    # y halos (strips are (ex, Wl) — small)
    top = x[..., :ex, :]
    bot = x[..., Hl - ex:, :]
    from_up = jax.lax.ppermute(bot, y_axis_name, _ring(y_axis_name, 1))
    from_dn = jax.lax.ppermute(top, y_axis_name, _ring(y_axis_name, -1))
    out = jax.lax.dynamic_update_slice(out, from_up,
                                       zidx + (pad_j - ex, pad_x))
    out = jax.lax.dynamic_update_slice(out, from_dn,
                                       zidx + (pad_j + Hl, pad_x))
    # x halos incl. corners: strips span the y-padded row range
    row_lo, rows = pad_j - ex, Hl + 2 * ex
    strip_r = jax.lax.dynamic_slice(
        out, zidx + (row_lo, pad_x + Wl - ex),
        x.shape[:-2] + (rows, ex))
    strip_l = jax.lax.dynamic_slice(
        out, zidx + (row_lo, pad_x), x.shape[:-2] + (rows, ex))
    from_left = jax.lax.ppermute(strip_r, x_axis_name,
                                 _ring(x_axis_name, 1))
    from_right = jax.lax.ppermute(strip_l, x_axis_name,
                                  _ring(x_axis_name, -1))
    out = jax.lax.dynamic_update_slice(out, from_left,
                                       zidx + (row_lo, pad_x - ex))
    out = jax.lax.dynamic_update_slice(out, from_right,
                                       zidx + (row_lo, pad_x + Wl))
    return out


def trim(x, halo, axes=(-2, -1)):
    """Remove halo padding along ``axes``."""
    for axis in axes:
        x = jax.lax.slice_in_dim(x, halo, x.shape[axis] - halo, axis=axis)
    return x
