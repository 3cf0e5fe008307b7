"""Energy diagnostics for the 2.5D core.

JAX twin of ``calc_energy`` (reference ``no_limits_2_5d.py:35-60``), the
conservation oracle of BASELINE.md: kinetic + available-thermal + geopotential
energy, each column-integrated over true air mass.  Under a device mesh the
sums become ``psum``-reduced automatically by GSPMD.
"""

import jax.numpy as jnp

from gcmiipy_tpu import constants
from gcmiipy_tpu.ops.stencil import imh, jmh
from gcmiipy_tpu.physics import thermo


def calc_energy(p, u, v, t, q, geom):
    """Return (ke, ate, geo, total) in Joules (reference no_limits_2_5d.py:35-60)."""
    sig = jnp.asarray(geom.sig, t.dtype)
    dsig = jnp.asarray(geom.dsig, t.dtype)
    ptop = jnp.asarray(geom.ptop, t.dtype)
    area = jnp.asarray(geom.area, t.dtype)

    u_at_center = imh(u)
    v_at_center = jmh(v)
    mag2 = u_at_center ** 2 + v_at_center ** 2

    tp = p * sig + ptop
    tt = thermo.to_true_temp(t, tp)
    rho = tp / (constants.Rd * tt)
    dp = p * dsig
    depth = dp / (rho * constants.G)

    airmass = rho * depth * area

    total_depth = jnp.cumsum(depth, axis=0)
    geo = jnp.sum(total_depth * airmass * constants.G)

    ke = jnp.sum(mag2 * 0.5 * airmass)
    ate = jnp.sum(tt * constants.Cp * airmass)
    return ke, ate, geo, ke + ate + geo
