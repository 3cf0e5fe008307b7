"""Surface evaporation: bulk-aerodynamic latent flux into the lowest layer.

The reference declares this component but never implements it — an empty
function whose docstring names the standard bulk evaporation equation
(reference ``evaporation.py:5-9``, SURVEY.md section 2 #15).  This module
implements that equation (beyond-reference, clearly flagged):

    E = beta * rho_1 * C_E * |U_1| * (w_s(T_g, p_s) - q_1)    [kg m^-2 s^-1]

with ``beta = min(gw / gw_field_capacity, 1)`` the soil-wetness
availability factor, ``rho_1``/``q_1``/``|U_1|`` the lowest model layer's
density, specific humidity and wind speed (plus a gustiness floor so calm
columns still ventilate), and ``w_s`` the Buck saturation mixing ratio at
ground temperature (:mod:`gcmiipy_tpu.physics.humidity`, the same w_s the
reference uses for its Manabe RH initial condition).

Budget coupling (all three reservoirs close):

* lowest-layer moisture gains ``E g / dp_1`` [kg/kg/s];
* ground water loses ``E / rho_water`` [m/s];
* ground temperature loses ``L_v E / (C_g d_g)`` [K/s] latent cooling,
  the same 0.1 m slab heat capacity the grey radiation's ground budget
  uses (:func:`gcmiipy_tpu.physics.radiation.basic_grey_radiation`).

Condensation/dew (negative deficit) is clipped to zero: GCM-II handles dew
in its ground hydrology, which the reference also lacks; the clip keeps
``gw`` monotone non-increasing and is documented test-covered behavior.
"""

import jax.numpy as jnp

from gcmiipy_tpu import constants
from gcmiipy_tpu.physics import humidity

RHO_WATER = 1000.0       # [kg/m^3]
GROUND_SLAB = 0.1        # [m] slab depth of the ground heat reservoir
DEFAULT_CE = 1.3e-3      # bulk transfer coefficient (neutral, ~10 m)
DEFAULT_GUST = 1.0       # [m/s] gustiness floor for |U_1|
DEFAULT_GW_CAP = 0.15    # [m] field capacity for the beta factor


def bulk_evaporation(p, q, u, v, tt, gt, gw, geom, c_e=DEFAULT_CE,
                     gust=DEFAULT_GUST, gw_cap=DEFAULT_GW_CAP,
                     land_fraction=None):
    """Evaporative mass flux [kg m^-2 s^-1] (see module docstring).

    ``p`` [j,i]; ``q,u,v,tt`` [k,j,i] (lowest layer k=0 is used);
    ``gt, gw`` [j,i].  Pure and jit-safe.

    ``land_fraction=None`` (default, the pre-land-coupling behavior):
    returns the total flux ``E`` with the soil beta applied everywhere.
    With a land-fraction map (ModelConfig.land_cover='hansen'): returns
    ``(E_total, E_land)`` where the ocean fraction evaporates at beta=1
    (the sea never dries) and only ``E_land`` draws down ``gw``.
    """
    sig0 = jnp.asarray(geom.sig, p.dtype).reshape(-1)[0]
    ptop = jnp.asarray(geom.ptop, p.dtype)
    tp1 = p * sig0 + ptop
    rho1 = tp1 / (constants.Rd * tt[0])
    # C-grid u at i+1/2, v at j+1/2: average back to centers for |U|
    uc = 0.5 * (u[0] + jnp.roll(u[0], 1, axis=-1))
    vc = 0.5 * (v[0] + jnp.roll(v[0], 1, axis=-2))
    wind = jnp.sqrt(uc * uc + vc * vc + gust * gust)
    deficit = humidity.w_s_at(tp1, gt) - q[0]
    base = jnp.maximum(rho1 * c_e * wind * deficit, 0.0)
    beta = jnp.clip(gw / gw_cap, 0.0, 1.0)
    if land_fraction is None:
        return beta * base
    f = jnp.asarray(land_fraction, p.dtype)
    e_land = f * beta * base
    return e_land + (1.0 - f) * base, e_land


def evaporation_step(p, q, u, v, tt, gt, gw, dt, geom, c_e=DEFAULT_CE,
                     gust=DEFAULT_GUST, gw_cap=DEFAULT_GW_CAP,
                     land_fraction=None):
    """Apply one evaporation step; returns ``(q_n, gt_n, gw_n)``.

    The land flux is additionally limited so a step can never extract
    more water than the ground holds (``E dt <= gw rho_water``); with a
    ``land_fraction`` map only the land share depletes ``gw`` (the ocean
    share draws on an unlimited reservoir).
    """
    if land_fraction is None:
        E = bulk_evaporation(p, q, u, v, tt, gt, gw, geom, c_e=c_e,
                             gust=gust, gw_cap=gw_cap)
        E = jnp.minimum(E, gw * RHO_WATER / dt)
        e_land = E
    else:
        E, e_land = bulk_evaporation(p, q, u, v, tt, gt, gw, geom, c_e=c_e,
                                     gust=gust, gw_cap=gw_cap,
                                     land_fraction=land_fraction)
        cap = gw * RHO_WATER / dt
        clipped = jnp.minimum(e_land, cap)
        E = E - (e_land - clipped)
        e_land = clipped
    dsig0 = jnp.asarray(geom.dsig, p.dtype).reshape(-1)[0]
    dp1 = p * dsig0
    q_n = q.at[0].add(E * constants.G / dp1 * dt)
    gw_n = gw - e_land / RHO_WATER * dt
    lv = constants.lhv_water_0c
    gt_n = gt - lv * E / (constants.Cg * GROUND_SLAB) * dt
    return q_n, gt_n, gw_n


def evaporation(tt, gt, gw, wind_speed, rh):
    """The reference's declared-but-empty entry point
    (``evaporation.py:5-9``): kept for API parity, now forwarding to the
    implemented bulk formula is impossible at this signature (no pressure
    or geometry), so it raises with a pointer to the working API."""
    raise NotImplementedError(
        "unimplemented in the reference (evaporation.py:5-9); use "
        "bulk_evaporation()/evaporation_step() — the working TPU-native "
        "implementation with an explicit (p, geom) interface")
