"""C-grid shift / average / difference operators (periodic, roll-based).

These are the JAX twins of the reference's coordinate modules
(``coordinates_1d.py``, ``coordinates.py``, ``coordinates_3d.py``): pure
periodic shift operators built on ``jnp.roll``.  They define the array-index
<-> C-grid convention shared by every dynamical core in the framework.

Grid convention (reference ``coordinates_3d.py:7-27``)::

    U is x dimension velocity, with the i component
    V is y dimension velocity, with the j component
    arrays are [k, j, i]   (layer, latitude, longitude)

    grid is:
       i h ip
    j  P U P
    h  V   V
    jp P U P

``h`` denotes the half point, ``m`` minus one, ``p`` plus one.  U lives at
(i+1/2, j); V at (i, j+1/2).

Under ``jit`` each roll compiles to a slice+concatenate pair which XLA fuses
into neighbouring elementwise work; the Pallas kernels in
``gcmiipy_tpu/ops/pallas_stencil.py`` fuse entire tendencies for the hot
path.  These roll ops remain the semantic source of truth and the oracle
used by the test-suite.
"""

import jax.numpy as jnp

# Axis conventions (reference coordinates_3d.py:28-30)
i_axis = -1
j_axis = -2
k_axis = -3


# ---------------------------------------------------------------------------
# 1D operators (reference coordinates_1d.py:25-53)
# ---------------------------------------------------------------------------

def ip(q):
    """q at i+1 (periodic)."""
    return jnp.roll(q, -1, axis=-1)


def im(q):
    """q at i-1 (periodic)."""
    return jnp.roll(q, 1, axis=-1)


def iph_1d(q):
    """q averaged to i+1/2."""
    return (q + ip(q)) * 0.5


def imh_1d(q):
    """q averaged to i-1/2."""
    return (q + im(q)) * 0.5


def div_1d(q_h, dx):
    """Divergence at cell center of an edge quantity (reference coordinates_1d.py:41)."""
    return (q_h - im(q_h)) / dx


def divu_1d(q_h, dx):
    """Centered divergence (reference coordinates_1d.py:45)."""
    return (ip(q_h) - im(q_h)) / (2 * dx)


def gradh_1d(q_i, dx):
    """Gradient at the half point of a centered quantity (reference coordinates_1d.py:49)."""
    return (ip(q_i) - q_i) / dx


# ---------------------------------------------------------------------------
# 2D / 3D shifts (reference coordinates_3d.py:32-60). The same functions work
# for [j, i] and [k, j, i] arrays since the axes are counted from the end.
# ---------------------------------------------------------------------------

def ipj(q):
    """q at (i+1, j)."""
    return jnp.roll(q, -1, axis=i_axis)


def imj(q):
    """q at (i-1, j)."""
    return jnp.roll(q, 1, axis=i_axis)


def ijp(q):
    """q at (i, j+1)."""
    return jnp.roll(q, -1, axis=j_axis)


def ijm(q):
    """q at (i, j-1)."""
    return jnp.roll(q, 1, axis=j_axis)


def imjp(q):
    """q at (i-1, j+1) (reference coordinates.py:48)."""
    return imj(ijp(q))


def kp(q):
    """q at layer k+1 (periodic in k; callers rely on boundary terms being zero)."""
    return jnp.roll(q, -1, axis=k_axis)


def km(q):
    """q at layer k-1."""
    return jnp.roll(q, 1, axis=k_axis)


# ---------------------------------------------------------------------------
# Half-point averages (reference coordinates_3d.py:63-84)
# ---------------------------------------------------------------------------

def kph(q):
    return (q + kp(q)) * 0.5


def kmh(q):
    return (q + km(q)) * 0.5


def iph(q):
    return (q + ipj(q)) * 0.5


def imh(q):
    return (q + imj(q)) * 0.5


def jph(q):
    return (q + ijp(q)) * 0.5


def jmh(q):
    return (q + ijm(q)) * 0.5


# ---------------------------------------------------------------------------
# Gradients at half points (reference coordinates_3d.py:87-98)
# ---------------------------------------------------------------------------

def gradi(q_i, dx):
    """Gradient at (i+1/2, j) of a centered quantity."""
    return (ipj(q_i) - q_i) / dx


def gradj(q_j, dy):
    """Gradient at (i, j+1/2) of a centered quantity."""
    return (ijp(q_j) - q_j) / dy
