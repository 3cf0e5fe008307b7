"""Pure-NumPy float64 oracle of the grey-gas radiation column physics.

Companion to :mod:`gcmiipy_tpu.oracle.numpy_ref` (the dynamics oracle): a
pint-free NumPy transcription of the reference ``grey_solar.py`` physics —
``basic_grey_radiation`` (reference ``grey_solar.py:358-563``, the one wired
into the model driver), ``grey_solar`` (``:106-184``) and ``grey_radiation``
(``:192-320``) — written with the reference's own per-layer Python loops so
it is structurally independent of the ``lax.scan`` implementation in
:mod:`gcmiipy_tpu.physics.radiation` it oracles.

Reference quirks preserved on purpose (same as the JAX twin):

* ``basic_grey_radiation``'s upwelling absorption LWA_b integrates layer
  emission only, starting from ZERO at the surface — the ground term is
  handled analytically by U_n (reference ``grey_solar.py:513-518``);
* ``zenith_angle`` passes the (J, 1) latitude column (not the tiled grid)
  into ``solar_zenith_angle`` and folds the hour angle into the longitudes
  (reference ``grey_solar.py:49-65``);
* ``grey_radiation``'s ground reflects 10% of arriving shortwave which then
  leaves the budget (never re-enters the sweeps), and cloud reflection
  accumulates without re-emission (reference ``grey_solar.py:289-294``).
"""

import math

import numpy as np

from gcmiipy_tpu import constants
from gcmiipy_tpu.physics.radiation import (
    co2_mmr, co2_sw_weight, co2_weight, h2o_weight, ozone_weight)


def ozone_at_np(tp):
    from gcmiipy_tpu.physics.ozone import O_PRESSURE_PA, O_VALUE
    return np.interp(np.asarray(tp), np.asarray(O_PRESSURE_PA),
                     np.asarray(O_VALUE))


def solar_zenith_angle_np(latitude, hour_angle, declination):
    return (np.sin(latitude) * np.sin(declination)
            + np.cos(latitude) * np.cos(declination) * np.cos(hour_angle))


def zenith_angle_np(longs, lats, time, geom, declination=0.0):
    hour_angle = time / (-24.0 * 3600.0) * 2 * math.pi
    point_angle = np.asarray(longs)[None, :] + hour_angle
    sza = solar_zenith_angle_np(np.asarray(lats).reshape(-1, 1),
                                point_angle, declination)
    return np.maximum(sza, 0.0)


def solar_declination_np(utc, obliquity_deg=23.44, year_days=365.0):
    """Twin of radiation.solar_declination (the DAILY analog)."""
    d = np.asarray(utc, np.float64) / 86400.0
    return (-math.radians(obliquity_deg)
            * np.cos(2 * math.pi * (d + 10.0) / year_days))


def compute_absorbance_np(gasses, rho, path_length):
    absorbance = np.zeros(np.shape(rho))
    for gas, coefficient in gasses:
        absorbance = absorbance + gas * rho * path_length * coefficient
    return absorbance


def hansen_cloud_thickness_np(tp, tt):
    thickness = (tp - 100.0e2) * 0.0133 / 100.0
    thickness = np.where(tt < 258.0, 1.0 / 3.0, thickness)
    return np.where(thickness < 0, 0.0, thickness)


def basic_grey_radiation_np(p, tp, tt, gt, t_lw, t_sw, albedo, utc, geom,
                            return_fluxes=False, declination=0.0):
    """Reference ``grey_solar.py:358-563``.  Returns (dTdt, dt_ground)
    [, fluxes dict when ``return_fluxes``]."""
    p = np.asarray(p, np.float64)
    tt = np.asarray(tt, np.float64)
    gt = np.asarray(gt, np.float64)
    L = geom.layers
    dsig = np.asarray(geom.dsig, np.float64)
    lw_t = t_lw ** dsig
    sw_t = t_sw ** dsig

    emission = (1 - lw_t) * constants.sb_constant * tt ** 4
    cum_sw_top = np.cumprod(np.broadcast_to(sw_t, tt.shape)[::-1],
                            axis=0)[::-1]
    cum_lw_bottom = np.cumprod(np.broadcast_to(lw_t, tt.shape), axis=0)
    clw_b_div = cum_lw_bottom / lw_t
    B = np.sum(emission * clw_b_div, axis=0)

    sza = zenith_angle_np(geom.long, geom.lat, utc, geom,
                          declination=declination)
    Sc = constants.solar_constant * sza
    S = (1 - albedo) * Sc * cum_sw_top[0]
    U_s = constants.sb_constant * gt ** 4
    dt_ground = (B + S - U_s) / constants.Cg / 0.1

    lw_t_full = np.broadcast_to(lw_t, emission.shape)

    # downwelling LW absorption, top -> bottom (grey_solar.py:483-492)
    downwelling = np.zeros((L + 1,) + Sc.shape)
    LWA_a = np.zeros(emission.shape)
    for i in reversed(range(L)):
        LWA_a[i] = downwelling[i + 1] * (1 - lw_t_full[i])
        downwelling[i] = downwelling[i + 1] * lw_t_full[i] + emission[i]

    # upwelling absorption from layer emission only, ZERO at the surface
    # (the reference's LWA_b quirk, grey_solar.py:513-518)
    upwelling = np.zeros((L + 1,) + Sc.shape)
    LWA_b = np.zeros(emission.shape)
    for i in range(L):
        LWA_b[i] = upwelling[i] * (1 - lw_t_full[i])
        upwelling[i + 1] = upwelling[i] * lw_t_full[i] + emission[i]

    U_n = clw_b_div * U_s * (1 - lw_t)
    S_n = (1 - sw_t) * cum_sw_top / sw_t * Sc
    B_n = emission
    dTdt = (U_n + S_n - 2 * B_n + LWA_a + LWA_b) * (
        constants.G / (constants.Cp * p * dsig))
    if not return_fluxes:
        return dTdt, dt_ground
    # escapes (for the budget-closure test): LW leaving at TOA = ground
    # emission through the whole column + the top of the emission-only
    # upwelling ladder; SW lost = the albedo reflection at the ground.
    fluxes = {
        "Sc": Sc,
        "sw_reflected": albedo * Sc * cum_sw_top[0],
        "lw_escape_ground": U_s * cum_lw_bottom[-1],
        "lw_escape_layers": upwelling[L],
        "B": B, "S": S, "U_s": U_s,
        "emission": emission,
    }
    return dTdt, dt_ground, fluxes


def grey_solar_np(p, q, t, c, gt, utc, dt, geom):
    """Reference ``grey_solar.py:106-184``: SW-only sweep with clouds.
    Returns (t_next, downwelling levels 0..L bottom-up)."""
    from gcmiipy_tpu.physics import thermo
    p = np.asarray(p, np.float64)
    q = np.asarray(q, np.float64)
    t = np.asarray(t, np.float64)
    L = geom.layers
    sig = np.asarray(geom.sig, np.float64)
    dsig = np.asarray(geom.dsig, np.float64)

    tp = p * sig + float(geom.ptop)
    tt = np.asarray(thermo.to_true_temp(t, tp))
    rho = tp / (constants.Rd * tt)
    dp = p * dsig
    oc = ozone_at_np(tp)
    depth = dp / (rho * constants.G)

    absorbance = compute_absorbance_np(
        [(oc, ozone_weight), (q, h2o_weight)], rho, depth)
    transmittance = 10.0 ** -absorbance
    t_cloud = 10.0 ** -(absorbance * 1.66)
    cloud_albedo = (1 - np.exp(-hansen_cloud_thickness_np(tp, tt))) * 0.7

    downwelling = np.zeros((L + 1,) + p.shape)
    downwelling[-1] = constants.solar_constant * 0.25
    absorbed = np.zeros(q.shape)
    for layer in reversed(range(L)):
        previous = downwelling[layer + 1]
        absorbed_nc = (1 - c) * (previous * (1 - transmittance[layer]))
        reflected = c * cloud_albedo[layer] * previous
        absorbed_c = (c * (1 - cloud_albedo[layer]) * previous
                      * (1 - t_cloud[layer]))
        total = absorbed_nc + absorbed_c
        downwelling[layer] = previous - total - reflected
        absorbed[layer] = total

    dT = absorbed / constants.Cp / rho / depth * dt
    t_n = np.asarray(thermo.to_potential_temp(tt + dT, tp))
    return t_n, downwelling


def grey_radiation_np(p, q, tt, c, gt, utc, dt, geom, return_fluxes=False):
    """Reference ``grey_solar.py:192-320``: full SW+LW sweeps with clouds.
    Returns (dt_ground, dt_air, toa_up)[, fluxes]."""
    p = np.asarray(p, np.float64)
    q = np.asarray(q, np.float64)
    tt = np.asarray(tt, np.float64)
    gt = np.asarray(gt, np.float64)
    L = geom.layers
    sig = np.asarray(geom.sig, np.float64)
    dsig = np.asarray(geom.dsig, np.float64)

    tp = p * sig + float(geom.ptop)
    rho = tp / (constants.Rd * tt)
    dp = p * dsig
    depth = dp / (rho * constants.G)

    irradiance = 2 * 41840.0 / 60.0 * 0.5 * 0.5

    sw_absorbance = compute_absorbance_np(
        [(q, h2o_weight), (co2_mmr, co2_sw_weight)], rho, depth)
    sw_transmittance = 10.0 ** -sw_absorbance
    sw_t_cloud = 10.0 ** -(sw_absorbance * 1.66)
    lw_absorbance = compute_absorbance_np(
        [(q, h2o_weight), (co2_mmr, co2_weight)], rho, depth)

    cloud_thickness = hansen_cloud_thickness_np(tp, tt)
    sw_cloud_albedo = (1 - np.exp(-cloud_thickness)) * 0.7
    lw_cloud_absorbance = cloud_thickness / math.log(10.0) + lw_absorbance
    lw_emissivity = 1 - 10.0 ** -lw_absorbance
    lw_cloud_emissivity = 1 - 10.0 ** -lw_cloud_absorbance

    emittance = (constants.sb_constant * tt ** 4
                 * ((1 - c) * lw_emissivity + c * lw_cloud_emissivity))
    ground_emittance = constants.sb_constant * gt ** 4

    flux_shape = (L + 1,) + p.shape
    thermal_down = np.zeros(flux_shape)
    thermal_up = np.zeros(flux_shape)
    solar_down = np.zeros(flux_shape)
    solar_down[-1] = irradiance

    absorbed = np.zeros(q.shape)
    reflected = np.zeros(p.shape)
    for layer in reversed(range(L)):
        previous = solar_down[layer + 1]
        absorbed_nc = (1 - c) * (previous * (1 - sw_transmittance[layer]))
        sw_reflected = c * sw_cloud_albedo[layer] * previous
        absorbed_c = (c * (1 - sw_cloud_albedo[layer]) * previous
                      * (1 - sw_t_cloud[layer]))
        total = absorbed_nc + absorbed_c
        solar_down[layer] = previous - total - sw_reflected
        reflected += sw_reflected
        absorbed[layer] += total

        previous = thermal_down[layer + 1]
        total_abs = (c * lw_cloud_emissivity[layer]
                     + (1 - c) * lw_emissivity[layer]) * previous
        absorbed[layer] += total_abs
        thermal_down[layer] = previous - total_abs + emittance[layer]

    ground_albedo = 0.1
    ground_absorbtion = ((1 - ground_albedo) * solar_down[0]
                         + thermal_down[0])

    thermal_up[0] = ground_emittance
    for layer in range(L):
        previous = thermal_up[layer]
        total_abs = (c * lw_cloud_emissivity[layer]
                     + (1 - c) * lw_emissivity[layer]) * previous
        absorbed[layer] += total_abs
        thermal_up[layer + 1] = previous - total_abs + emittance[layer]

    dt_ground = (ground_absorbtion - ground_emittance) / constants.Cg / 0.1
    dt_air = (absorbed - 2 * emittance) / (constants.Cp * rho * depth)
    if not return_fluxes:
        return dt_ground, dt_air, thermal_up[-1]
    fluxes = {
        "irradiance": irradiance,
        "reflected": reflected,
        "sw_ground_leak": ground_albedo * solar_down[0],
        "toa_up": thermal_up[-1],
        "absorbed": absorbed,
        "emittance": emittance,
        "ground_absorbtion": ground_absorbtion,
        "ground_emittance": ground_emittance,
    }
    return dt_ground, dt_air, thermal_up[-1], fluxes


def solar_timestep_np(t, p, gt, dt, utc, t_lw, t_sw, albedo, geom,
                      declination=0.0):
    """The driver's radiative heating step (reference
    ``no_limits_2_5d.py:66-75``) on NumPy: potential -> true temperature,
    ``basic_grey_radiation``, Euler update, back to potential temperature.
    ``declination`` follows the driver's seasonal (DAILY) mode.
    Returns (t_next, gt_next)."""
    from gcmiipy_tpu.physics import thermo
    sig = np.asarray(geom.sig, np.float64)
    tp = np.asarray(p, np.float64) * sig + float(geom.ptop)
    tt = np.asarray(thermo.to_true_temp(np.asarray(t, np.float64), tp))
    dTdt, dt_ground = basic_grey_radiation_np(
        p, tp, tt, np.asarray(gt, np.float64), t_lw, t_sw, albedo, utc,
        geom, declination=declination)
    gt_n = np.asarray(gt, np.float64) + dt_ground * dt
    tt_n = tt + dTdt * dt
    t_n = np.asarray(thermo.to_potential_temp(tt_n, tp))
    return t_n, gt_n


# ---- four-band longwave (ModelConfig.radiation = "4band") -----------------

def planck_cumfrac_np(x, terms=60):
    """Blackbody emission fraction below dimensionless frequency x
    (series form; twin of radiation._planck_cumfrac)."""
    x = np.asarray(x, np.float64)
    acc = np.zeros_like(x)
    for n in range(1, terms + 1):
        acc += np.exp(-n * x) * (x ** 3 / n + 3 * x ** 2 / n ** 2
                                 + 6 * x / n ** 3 + 6 / n ** 4)
    return 1.0 - acc * 15.0 / np.pi ** 4


def four_band_fractions_np(tt, exact=False):
    """Planck band fractions (4, ...).  ``exact=True`` evaluates the
    series directly (for bounding the jax polynomial-fit error);
    otherwise uses the same fitted polynomials as the jax path."""
    from gcmiipy_tpu.physics.radiation import (_BAND_POLYS, _C2_CM_K,
                                               FOUR_BAND_EDGES_CM)
    tt = np.asarray(tt, np.float64)
    if exact:
        below = [planck_cumfrac_np(_C2_CM_K * e / tt)
                 for e in FOUR_BAND_EDGES_CM[1:]]
        f = [below[0], below[1] - below[0], below[2] - below[1]]
    else:
        # same [150, 350] K fit-range clamp as the jax path
        s = np.clip((tt - 250.0) / 100.0, -1.0, 1.0)
        f = [np.polyval(c, s) for c in _BAND_POLYS]
    return np.stack(f + [1.0 - (f[0] + f[1] + f[2])])


def four_band_radiation_np(p, tp, tt, q, gt, t_sw, albedo, utc, geom,
                           return_fluxes=False, declination=0.0):
    """Float64 NumPy twin of radiation.four_band_radiation (explicit
    per-band k-loops)."""
    from gcmiipy_tpu.physics import radiation as rad
    p = np.asarray(p, np.float64)
    tt = np.asarray(tt, np.float64)
    q = np.asarray(q, np.float64)
    gt = np.asarray(gt, np.float64)
    L = geom.layers
    dsig = np.asarray(geom.dsig, np.float64)
    sw_t = t_sw ** dsig

    dp_norm = p * dsig / 1.0e5
    q_gkg = q * 1000.0
    ones = np.ones_like(q)
    eps = np.stack([rad.ABLWV2 * q_gkg * dp_norm,
                    rad.ABLCO2 * ones * dp_norm,
                    rad.ABLWIN * ones * dp_norm,
                    rad.ABLWV1 * q_gkg * dp_norm])
    t_b = np.exp(-rad._LW_DIFFUSIVITY * eps)          # (4, L, ...)
    f_b = four_band_fractions_np(tt)
    emission = f_b * (1 - t_b) * constants.sb_constant * tt ** 4

    # exclusive cumprod: prod of t below layer k (0/0-safe in fully
    # opaque bands, matching the jax path)
    cum_b_bottom = np.cumprod(t_b, axis=1)
    c_div = np.concatenate([np.ones_like(t_b[:, :1]),
                            cum_b_bottom[:, :-1]], axis=1)
    B = np.sum(emission * c_div, axis=(0, 1))

    cum_sw_top = np.cumprod(np.broadcast_to(sw_t, tt.shape)[::-1],
                            axis=0)[::-1]
    sza = zenith_angle_np(geom.long, geom.lat, utc, geom,
                          declination=declination)
    Sc = constants.solar_constant * sza
    S = (1 - albedo) * Sc * cum_sw_top[0]
    U_s = constants.sb_constant * gt ** 4
    dt_ground = (B + S - U_s) / constants.Cg / 0.1

    LWA_a = np.zeros(emission.shape)
    down = np.zeros((4,) + Sc.shape)
    for k in reversed(range(L)):
        LWA_a[:, k] = down * (1 - t_b[:, k])
        down = down * t_b[:, k] + emission[:, k]
    LWA_b = np.zeros(emission.shape)
    up = np.zeros((4,) + Sc.shape)
    for k in range(L):
        LWA_b[:, k] = up * (1 - t_b[:, k])
        up = up * t_b[:, k] + emission[:, k]

    fg = four_band_fractions_np(gt)
    U_n = (fg[:, None] * U_s * c_div * (1 - t_b)).sum(0)
    S_n = (1 - sw_t) * cum_sw_top / sw_t * Sc
    dTdt = (U_n + S_n - 2 * emission.sum(0) + LWA_a.sum(0)
            + LWA_b.sum(0)) * (constants.G / (constants.Cp * p * dsig))
    if not return_fluxes:
        return dTdt, dt_ground
    fluxes = {
        "Sc": Sc,
        "sw_reflected": albedo * Sc * cum_sw_top[0],
        "lw_escape_ground": (fg[:, None] * U_s
                             * cum_b_bottom)[:, -1].sum(0),
        "lw_escape_layers": up.sum(0),
        "B": B, "S": S, "U_s": U_s,
        "emission": emission.sum(0),
    }
    return dTdt, dt_ground, fluxes
