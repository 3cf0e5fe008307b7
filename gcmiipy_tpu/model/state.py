"""Model state pytrees and initial conditions.

Mirrors the reference's ``PrognosticVars`` / ``GroundVars`` namedtuples
(reference ``no_limits_2_5d.py:142-143``) — as NamedTuples they are already
JAX pytrees, so the whole state flows through jit / scan / donation / pjit
sharding as a unit.
"""

from typing import NamedTuple

import jax.numpy as jnp

from gcmiipy_tpu.physics import humidity, thermo


class PrognosticVars(NamedTuple):
    """Prognostic atmosphere state: p [j,i]; u,v,t,q [k,j,i]."""
    p: jnp.ndarray   # surface pressure minus ptop [Pa]
    u: jnp.ndarray   # zonal velocity at i+1/2 [m/s]
    v: jnp.ndarray   # meridional velocity at j+1/2 [m/s]
    t: jnp.ndarray   # potential temperature [K]
    q: jnp.ndarray   # specific humidity [kg/kg]


class GroundVars(NamedTuple):
    """Ground state (reference no_limits_2_5d.py:143)."""
    gt: jnp.ndarray    # ground temperature [K]
    gw: jnp.ndarray    # ground water [m]
    snow: jnp.ndarray  # snow depth [m]
    ice: jnp.ndarray   # ice depth [m]


class ModelState(NamedTuple):
    """Full model state: atmosphere + ground + model time [s] + exact
    integer step count (cadenced extras like the Shapiro FILTER key off
    ``step``, not off float model time, so long f32 runs never drift)."""
    prog: PrognosticVars
    ground: GroundVars
    utc: jnp.ndarray
    step: jnp.ndarray


def gen_initial_conditions(geom, dtype=jnp.float32, surface_pressure=None):
    """Reference initial conditions (reference no_limits_2_5d.py:146-168):

    p = 1e5 Pa - ptop, u = 1 m/s, v = 0, tt = 360 K isothermal,
    q = max(3e-6, Manabe RH profile converted to mmr), ground at 360 K.

    ``surface_pressure``: optional (J, I) absolute surface pressure [Pa]
    replacing the uniform 1e5 — the terrain-balanced start
    (geometry.pressure_from_heightmap); t and q derive from it so the
    initial column thermodynamics stay self-consistent over topography.
    """
    full = (geom.layers, geom.height, geom.width)
    surface = (geom.height, geom.width)
    sig = jnp.asarray(geom.sig, dtype)
    ptop = jnp.asarray(geom.ptop, dtype)

    if surface_pressure is None:
        p = jnp.full(surface, 100000.0, dtype=dtype) - ptop
    else:
        p = jnp.asarray(surface_pressure, dtype) - ptop
    u = jnp.full(full, 1.0, dtype=dtype)
    v = jnp.zeros(full, dtype=dtype)
    tt = jnp.full(full, 360.0, dtype=dtype)
    tp = p * sig + ptop
    t = thermo.to_potential_temp(tt, tp)
    q = jnp.full(full, 3.0e-6, dtype=dtype)
    q = jnp.maximum(q, humidity.rh_to_mmr(humidity.manabe_rh(sig), tp, tt))

    gt = jnp.full(surface, 360.0, dtype=dtype)
    gw = jnp.zeros(surface, dtype=dtype)
    snow = jnp.zeros(surface, dtype=dtype)
    ice = jnp.zeros(surface, dtype=dtype)

    return PrognosticVars(p, u, v, t, q), GroundVars(gt, gw, snow, ice)
