"""Grey-gas radiation column physics.

TPU-native twin of reference ``grey_solar.py``: a single-band ("grey")
shortwave + longwave radiative transfer with ozone/CO2/H2O absorbers, Hansen
1983 cloud optical thickness and a slab ground.  Everything is column-local
(embarrassingly parallel over (j, i)); the vertical sweeps are
``lax.scan`` recurrences over the <=18 sigma layers, fused per column so no
HBM round-trips occur between levels (SURVEY.md section 7 "hard parts").

SI units throughout.  The three public entry points mirror the reference:

* :func:`grey_solar` — SW-only sweep with ozone+H2O and clouds
  (reference ``grey_solar.py:106-184``).
* :func:`grey_radiation` — full SW+LW down/up sweeps with clouds
  (reference ``grey_solar.py:192-320``).
* :func:`basic_grey_radiation` — the AD section 2.7 grey atmosphere used by
  the model driver (reference ``grey_solar.py:358-563``).
"""

import math

import jax
import jax.numpy as jnp

from gcmiipy_tpu import constants
from gcmiipy_tpu.physics import ozone as ozone_mod
from gcmiipy_tpu.physics import thermo
from gcmiipy_tpu.physics.humidity import vmr_from_mmr


def mmr_from_vmr(vmr, mmg, mma):
    """Mass from volumetric mixing ratio (reference grey_solar.py:21-26)."""
    return vmr * mmg / mma


# 300 ppm CO2 as mass mixing ratio (reference grey_solar.py:29)
co2_mmr = mmr_from_vmr(300 / 1e6, constants.M_CO2, constants.Md)

# Grey absorption cross-sections [m^2/kg] (reference grey_solar.py:76-83)
h2o_weight = 0.125
liquid_weight = 5.0
co2_weight = 1.0
co2_sw_weight = co2_weight
# The reference sets ozone_weight = 0.01 in the units of h2o_weight
# (grey_solar.py:82): a plain 0.01 m^2/kg.
ozone_weight = 0.01

# Four-band longwave absorptivities per dp = 1e5 Pa, from MITgcm/aim — noted
# by the reference for a future multi-band scheme (no_limits_2_5d.py:241-248;
# water-vapor terms per dq = 1 g/kg).  Consumed by :func:`four_band_radiation`
# (``ModelConfig.radiation = "4band"``).
ABLWIN = 0.7   # window band
ABLCO2 = 4.0   # CO2 band
ABLWV1 = 0.7   # weak water-vapor band
ABLWV2 = 50.0  # strong water-vapor band

# Spectral edges of the four LW bands [cm^-1]: the H2O rotation band
# (strong), the 15 um CO2 band, the atmospheric window, and the H2O
# vibration-rotation band (weak) — the standard partition the aim
# absorptivities above parametrize.
FOUR_BAND_EDGES_CM = (0.0, 600.0, 800.0, 1200.0)
_C2_CM_K = 1.438777  # hc/k [cm K]
_LW_DIFFUSIVITY = 1.66  # Elsasser diffuse-path factor (grey_solar.py:145)


def _planck_cumfrac(x, terms=60):
    """Fraction of blackbody emission at dimensionless frequency < x
    (x = c2*nu/T): (15/pi^4) * sum_n e^{-nx}(x^3/n + 3x^2/n^2 + 6x/n^3
    + 6/n^4).  NumPy, host-side (used to fit the band polynomials)."""
    import numpy as _np
    x = _np.asarray(x, _np.float64)
    acc = _np.zeros_like(x)
    for n in range(1, terms + 1):
        acc += _np.exp(-n * x) * (x ** 3 / n + 3 * x ** 2 / n ** 2
                                  + 6 * x / n ** 3 + 6 / n ** 4)
    return 1.0 - acc * 15.0 / math.pi ** 4


def _fit_band_fraction_polys(deg=6, t_lo=150.0, t_hi=350.0):
    """Degree-``deg`` polynomial fits (in (T-250)/100) of the Planck
    fraction emitted in each of the three bounded bands; the open
    top band is 1 - sum.  Max fit residual < 2e-4 over [150, 350] K."""
    import numpy as _np
    T = _np.linspace(t_lo, t_hi, 201)
    fr_below = [_planck_cumfrac(_C2_CM_K * edge / T)
                for edge in FOUR_BAND_EDGES_CM[1:]]          # 600/800/1200
    bands = [fr_below[0], fr_below[1] - fr_below[0],
             fr_below[2] - fr_below[1]]
    s = (T - 250.0) / 100.0
    return _np.stack([_np.polyfit(s, b, deg) for b in bands])  # (3, deg+1)


_BAND_POLYS = _fit_band_fraction_polys()


def four_band_fractions(tt):
    """Planck emission fraction per LW band at temperature ``tt`` [K]:
    stacked (4, ...) = (H2O-rotation, CO2, window, H2O-vibration);
    sums to 1 exactly (the open band is the complement).

    The degree-6 fits are valid on [150, 350] K; the fit variable is
    clamped to that range so out-of-range ground temperatures (hot starts,
    blown columns) cannot extrapolate into negative band fractions
    (round-4 advisor)."""
    s = jnp.clip((tt - 250.0) / 100.0, -1.0, 1.0)
    fs = [jnp.polyval(jnp.asarray(c, tt.dtype), s) for c in _BAND_POLYS]
    f4 = 1.0 - (fs[0] + fs[1] + fs[2])
    return jnp.stack([fs[0], fs[1], fs[2], f4])


def daily_average_irradiance(lat, declination):
    """Manabe 1964 daily-mean insolation (reference grey_solar.py:32-36).

    ``lat``/``declination`` in radians; returns W/m^2.
    """
    dH = jnp.arccos(-jnp.tan(lat) * jnp.tan(declination))
    manabe64_Sc = 2 * 41840.0 / 60.0  # J/m^2/min -> W/m^2
    return manabe64_Sc / math.pi * (
        dH * jnp.sin(lat) * jnp.sin(declination)
        + jnp.cos(lat) * jnp.cos(declination) * jnp.sin(dH)
    )


def solar_declination(utc, obliquity_deg=23.44, year_days=365.0):
    """Solar declination [rad] from the model clock ``utc`` [s] — the DAILY
    analog (reference port.py:586-590 is a docstring-only stub; the
    reference pins declination to 0 at its zenith_angle call,
    grey_solar.py:60).

    Standard small-eccentricity approximation with the year anchored so
    utc = 0 is January 1 00:00: delta = -obliquity * cos(2*pi*(d+10)/Y),
    exact at the solstices (d+10 = 0 -> -23.44 deg, northern winter).
    """
    d = utc / 86400.0
    return (-math.radians(obliquity_deg)
            * jnp.cos(2 * math.pi * (d + 10.0) / year_days))


def solar_zenith_angle(latitude, hour_angle, declination):
    """cos(solar zenith angle) (reference grey_solar.py:40-46).  Radians."""
    return (jnp.sin(latitude) * jnp.sin(declination)
            + jnp.cos(latitude) * jnp.cos(declination) * jnp.cos(hour_angle))


def zenith_angle(longs, lats, time, geom, declination=0.0):
    """Clamped cos(zenith) over the grid at UTC ``time`` [s]
    (reference grey_solar.py:49-65).  ``longs`` (I,), ``lats`` (J,1), radians.

    ``declination`` defaults to 0 (perpetual equinox) exactly as the
    reference hard-codes it (grey_solar.py:60); pass
    :func:`solar_declination` of the clock for a seasonal cycle."""
    hour_angle = time / (-24.0 * 3600.0) * 2 * math.pi  # sun moves west
    point_angle = longs + hour_angle                    # (I,) broadcasts
    sza = solar_zenith_angle(lats, point_angle, declination)  # (J, I)
    return jnp.maximum(sza, 0.0)


def compute_absorbance(gasses, rho, path_length):
    """Beer-Lambert absorbance sum over (mixing ratio, cross-section) pairs
    (reference grey_solar.py:85-91)."""
    absorbance = jnp.zeros(jnp.shape(rho), dtype=jnp.result_type(rho))
    for gas, coefficient in gasses:
        absorbance = absorbance + gas * rho * path_length * coefficient
    return absorbance


def hansen_cloud_thickness(tp, tt):
    """Cloud optical thickness, Hansen 1983 eq. 21 (reference grey_solar.py:94-101).

    Mutation order matters and is preserved: cold layers (<258 K) get 1/3,
    then negatives are clamped to 0.
    """
    thickness = (tp - 100.0e2) * 0.0133 / 100.0   # per hPa -> per Pa
    thickness = jnp.where(tt < 258.0, 1.0 / 3.0, thickness)
    return jnp.where(thickness < 0, 0.0, thickness)


def _sw_cloud_sweep(downwelling_top, transmittance, t_cloud, cloud_albedo, c):
    """Downward SW sweep with partial cloud (reference grey_solar.py:157-171).

    Returns (downwelling levels L+1..0 stacked bottom-up, absorbed per layer,
    reflected total).  All recurrences run top->bottom via lax.scan.
    """
    def body(carry, xs):
        previous, reflected_total = carry
        trans_layer, t_cloud_layer, albedo_layer = xs
        absorbed_nc = (1 - c) * (previous * (1 - trans_layer))
        reflected = c * albedo_layer * previous
        absorbed_c = c * (1 - albedo_layer) * previous * (1 - t_cloud_layer)
        total_absorbed = absorbed_nc + absorbed_c
        transmitted = previous - total_absorbed - reflected
        return (transmitted, reflected_total + reflected), (transmitted, total_absorbed)

    xs = (transmittance, t_cloud, cloud_albedo)
    # scan from the top layer (index L-1) down to 0
    (last, reflected), (down_levels, absorbed) = jax.lax.scan(
        body, (downwelling_top, jnp.zeros_like(downwelling_top)), xs,
        reverse=True, unroll=True)
    return down_levels, absorbed, reflected


def grey_solar(p, q, t, c, gt, utc, dt, geom):
    """SW-only grey sweep; returns (t_next, downwelling levels)
    (reference grey_solar.py:106-184)."""
    sig = jnp.asarray(geom.sig, t.dtype)
    dsig = jnp.asarray(geom.dsig, t.dtype)
    ptop = jnp.asarray(geom.ptop, t.dtype)

    tp = p * sig + ptop
    tt = thermo.to_true_temp(t, tp)
    rho = tp / (constants.Rd * tt)
    dp = p * dsig
    oc = ozone_mod.ozone_at(tp)

    depth = dp / (rho * constants.G)
    path_length = depth

    gasses = [(oc, ozone_weight), (q, h2o_weight)]
    absorbance = compute_absorbance(gasses, rho, path_length)
    transmittance = 10.0 ** -absorbance
    a_cloud = absorbance * 1.66  # Manabe diffuse path factor (grey_solar.py:145)
    t_cloud = 10.0 ** -a_cloud

    cloud_thickness = hansen_cloud_thickness(tp, tt)
    cloud_albedo = (1 - jnp.exp(-cloud_thickness)) * 0.7

    top = jnp.full(p.shape, constants.solar_constant * 0.25, dtype=t.dtype)
    down_levels, absorbed, _ = _sw_cloud_sweep(
        top, transmittance, t_cloud, cloud_albedo, c)
    downwelling = jnp.concatenate([down_levels, top[None]], axis=0)

    dT = absorbed / constants.Cp / rho / depth * dt
    tt_n = tt + dT
    t_n = thermo.to_potential_temp(tt_n, tp)
    return t_n, downwelling


def grey_radiation(p, q, tt, c, g, utc, dt, geom):
    """Full SW+LW grey radiation with clouds; returns
    (dt_ground, dt_air, TOA thermal upwelling) (reference grey_solar.py:192-320)."""
    sig = jnp.asarray(geom.sig, tt.dtype)
    dsig = jnp.asarray(geom.dsig, tt.dtype)
    ptop = jnp.asarray(geom.ptop, tt.dtype)

    tp = p * sig + ptop
    rho = tp / (constants.Rd * tt)
    dp = p * dsig
    depth = dp / (rho * constants.G)
    path_length = depth

    # Manabe64 solar constant halved twice (reference grey_solar.py:207-209)
    irradiance = 2 * 41840.0 / 60.0 * 0.5 * 0.5

    sw_gasses = [(q, h2o_weight), (co2_mmr, co2_sw_weight)]
    sw_absorbance = compute_absorbance(sw_gasses, rho, path_length)
    sw_transmittance = 10.0 ** -sw_absorbance
    sw_t_cloud = 10.0 ** -(sw_absorbance * 1.66)

    lw_gasses = [(q, h2o_weight), (co2_mmr, co2_weight)]
    lw_absorbance = compute_absorbance(lw_gasses, rho, path_length)

    cloud_thickness = hansen_cloud_thickness(tp, tt)
    sw_cloud_albedo = (1 - jnp.exp(-cloud_thickness)) * 0.7
    lw_cloud_absorbance = cloud_thickness / math.log(10.0) + lw_absorbance

    lw_emissivity = 1 - 10.0 ** -lw_absorbance
    lw_cloud_emissivity = 1 - 10.0 ** -lw_cloud_absorbance

    emittance = (constants.sb_constant * tt ** 4
                 * ((1 - c) * lw_emissivity + c * lw_cloud_emissivity))
    ground_emittance = constants.sb_constant * g.gt ** 4

    # --- downwelling sweeps (SW with clouds, LW with emission), top->bottom
    top_sw = jnp.full(p.shape, irradiance, dtype=tt.dtype)
    sw_levels, absorbed_sw, reflected = _sw_cloud_sweep(
        top_sw, sw_transmittance, sw_t_cloud, sw_cloud_albedo, c)

    def lw_down_body(previous, xs):
        emit_layer, eps_clear, eps_cloud = xs
        total_absorbtion = (c * eps_cloud + (1 - c) * eps_clear) * previous
        lw_transmitted = previous - total_absorbtion
        nxt = lw_transmitted + emit_layer
        return nxt, (nxt, total_absorbtion)

    zero = jnp.zeros(p.shape, dtype=tt.dtype)
    xs = (emittance,
          jnp.broadcast_to(lw_emissivity, emittance.shape),
          jnp.broadcast_to(lw_cloud_emissivity, emittance.shape))
    _, (lw_down_levels, lw_absorbed_dw) = jax.lax.scan(
        lw_down_body, zero, xs, reverse=True, unroll=True)

    absorbed = absorbed_sw + lw_absorbed_dw

    # --- ground budget (reference grey_solar.py:290-293)
    ground_albedo = 0.1
    ground_sw_absorbtion = (1 - ground_albedo) * sw_levels[0]
    ground_lw_absorbtion = lw_down_levels[0]
    ground_absorbtion = ground_sw_absorbtion + ground_lw_absorbtion

    # --- upwelling LW sweep, bottom->top, starting from ground emittance
    def lw_up_body(previous, xs):
        emit_layer, eps_clear, eps_cloud = xs
        total_absorbtion = (c * eps_cloud + (1 - c) * eps_clear) * previous
        lw_transmitted = previous - total_absorbtion
        nxt = lw_transmitted + emit_layer
        return nxt, total_absorbtion

    toa_up, lw_absorbed_uw = jax.lax.scan(lw_up_body, ground_emittance, xs,
                                          unroll=True)
    absorbed = absorbed + lw_absorbed_uw

    dt_ground = (ground_absorbtion - ground_emittance) / constants.Cg / 0.1
    dt_air = (absorbed - 2 * emittance) / (constants.Cp * rho * depth)
    return dt_ground, dt_air, toa_up


def basic_grey_transmittances(t_lw, t_sw, geom):
    """Per-layer transmittances t^dsig (reference grey_solar.py:323-333)."""
    dsig = jnp.asarray(geom.dsig)
    lw_transmittance = t_lw ** dsig
    sw_transmittance = t_sw ** dsig
    return lw_transmittance, sw_transmittance


def basic_3_gas_absorbance(p, tp, tt, rho, q, geom):
    """LW (H2O+CO2) and SW (empty) grey absorbances
    (reference grey_solar.py:336-355)."""
    dsig = jnp.asarray(geom.dsig, q.dtype)
    dp = p * dsig
    depth = dp / (rho * constants.G)
    sw_absorbance = compute_absorbance([], rho, depth)
    lw_absorbance = compute_absorbance(
        [(q, h2o_weight), (co2_mmr, co2_weight)], rho, depth)
    return lw_absorbance, sw_absorbance


def basic_grey_radiation_ladder(p, tt, gt, t_lw, t_sw, albedo, sza,
                                dsig_vals):
    """Kernel-safe twin of :func:`basic_grey_radiation`'s core: identical
    math with every k-recurrence as a STATIC Python ladder over the
    L <= 18 layers — no ``cumprod``/``flip``/``lax.scan``, which Mosaic
    cannot lower inside Pallas kernels (CLAUDE.md constraints).  The
    per-layer grey transmittances and their cumulative products are
    PYTHON FLOATS (t_lw/t_sw scalars to static dsig powers), so the
    ladder is pure elementwise VPU work.

    ``p`` (rows, W); ``tt`` (L, rows, W) true temperature; ``gt`` ground
    temperature; ``sza`` the clamped cos-zenith field; ``dsig_vals`` the
    static per-layer sigma thicknesses (floats).  Returns
    ``(dTdt (L,rows,W), dt_ground (rows,W))`` — bitwise-compatible with
    :func:`basic_grey_radiation` up to float summation order.
    """
    L = len(dsig_vals)
    lw_t = [float(t_lw) ** float(d) for d in dsig_vals]
    sw_t = [float(t_sw) ** float(d) for d in dsig_vals]
    # cumulative transmittance products (floats)
    cum_sw_top = [0.0] * L          # prod of sw_t[k:] (incl. k)
    acc = 1.0
    for k in range(L - 1, -1, -1):
        acc *= sw_t[k]
        cum_sw_top[k] = acc
    clw_b_div = [0.0] * L           # prod of lw_t[:k] (excl. k)
    acc = 1.0
    for k in range(L):
        clw_b_div[k] = acc
        acc *= lw_t[k]

    sb = constants.sb_constant
    emission = [(1.0 - lw_t[k]) * sb * tt[k] ** 4 for k in range(L)]

    B = emission[0] * clw_b_div[0]
    for k in range(1, L):
        B = B + emission[k] * clw_b_div[k]
    Sc = constants.solar_constant * sza
    S = (1.0 - albedo) * Sc * cum_sw_top[0]
    U_s = sb * gt ** 4
    dt_ground = (B + S - U_s) / constants.Cg / 0.1

    # downwelling LW absorption, top -> bottom
    LWA_a = [None] * L
    d = jnp.zeros_like(p)
    for k in range(L - 1, -1, -1):
        LWA_a[k] = d * (1.0 - lw_t[k])
        d = d * lw_t[k] + emission[k]
    # upwelling from layer emission only, bottom -> top
    LWA_b = [None] * L
    d = jnp.zeros_like(p)
    for k in range(L):
        LWA_b[k] = d * (1.0 - lw_t[k])
        d = d * lw_t[k] + emission[k]

    dTdt = []
    for k in range(L):
        U_n = clw_b_div[k] * (1.0 - lw_t[k]) * U_s
        S_n = (1.0 - sw_t[k]) * cum_sw_top[k] / sw_t[k] * Sc
        dTdt.append((U_n + S_n - 2.0 * emission[k] + LWA_a[k] + LWA_b[k])
                    * (constants.G / (constants.Cp * float(dsig_vals[k])))
                    / p)
    return jnp.stack(dTdt), dt_ground


def basic_grey_radiation(p, tp, tt, g, t_lw, t_sw, albedo, utc, geom,
                         declination=0.0):
    """Basic grey atmosphere, Atmospheric Dynamics section 2.7
    (reference grey_solar.py:358-563) — the radiation actually wired into the
    model driver (reference no_limits_2_5d.py:69).

    ``declination`` [rad] feeds the zenith angle (0 = the reference's
    perpetual equinox; see :func:`solar_declination`).

    Returns (dTdt [K/s] per layer, dt_ground [K/s]).
    """
    dtype = tt.dtype
    dsig = jnp.asarray(geom.dsig, dtype)

    lw_transmittance, sw_transmittance = basic_grey_transmittances(t_lw, t_sw, geom)
    lw_transmittance = jnp.asarray(lw_transmittance, dtype)
    sw_transmittance = jnp.asarray(sw_transmittance, dtype)

    # 1) emission reaching the surface (eq. 2.25, grey_solar.py:374-386)
    emission = (1 - lw_transmittance) * constants.sb_constant * tt ** 4
    cum_sw_trans_from_top = jnp.flip(
        jnp.cumprod(jnp.flip(sw_transmittance, 0), axis=0), 0)
    cum_lw_trans_from_bottom = jnp.cumprod(lw_transmittance, axis=0)
    clw_b_div = cum_lw_trans_from_bottom / lw_transmittance
    B = jnp.sum(emission * clw_b_div, axis=0)

    # 2) solar received (eq. 2.26, grey_solar.py:390-394)
    sza = zenith_angle(jnp.asarray(geom.long, dtype),
                       jnp.asarray(geom.lat, dtype), utc, geom,
                       declination=declination)
    Sc = constants.solar_constant * sza
    S = (1 - albedo) * Sc * cum_sw_trans_from_top[0]

    # 3) surface emission (eq. 2.27, grey_solar.py:398-399)
    U_s = constants.sb_constant * g.gt ** 4

    dt_ground = (B + S - U_s) / constants.Cg / 0.1

    # Downwelling LW absorption per layer, top->bottom (grey_solar.py:480-492)
    lw_t_full = jnp.broadcast_to(lw_transmittance, emission.shape)

    def down_body(previous, xs):
        lw_t, emit_layer = xs
        absorbed_here = previous * (1 - lw_t)
        nxt = previous * lw_t + emit_layer
        return nxt, absorbed_here

    zero = jnp.zeros(jnp.shape(Sc), dtype=dtype)
    _, LWA_a = jax.lax.scan(down_body, zero, (lw_t_full, emission),
                            reverse=True, unroll=True)

    # Upwelling absorption from layer emission only (no ground term: the
    # ground is handled analytically by U_n) (grey_solar.py:513-518)
    def up_body(previous, xs):
        lw_t, emit_layer = xs
        absorbed_here = previous * (1 - lw_t)
        nxt = previous * lw_t + emit_layer
        return nxt, absorbed_here

    _, LWA_b = jax.lax.scan(up_body, zero, (lw_t_full, emission),
                            unroll=True)

    # absorbed terrestrial radiation, eq. 2.30 (grey_solar.py:534)
    U_n = clw_b_div * U_s * (1 - lw_transmittance)

    # absorbed solar radiation, eq. 2.31 (grey_solar.py:540)
    S_n = (1 - sw_transmittance) * cum_sw_trans_from_top / sw_transmittance * Sc

    # emitted longwave, eq. 2.32 (grey_solar.py:547)
    B_n = emission

    # temperature tendency, eq. 2.34 (grey_solar.py:554)
    dTdt = (U_n + S_n - 2 * B_n + LWA_a + LWA_b) * (
        constants.G / (constants.Cp * p * dsig))
    return dTdt, dt_ground


def four_band_transmittances(p, q, geom, dtype=None):
    """Per-layer LW transmittance in each of the 4 bands, stacked
    (4, L, ...): exp(-1.66 * eps_b) with the aim layer absorptivities
    eps = AB * dp/1e5 (water-vapor bands additionally scaled by q in
    g/kg) — the semantics the reference records for the constants
    (no_limits_2_5d.py:241-248)."""
    dtype = dtype or q.dtype
    dsig = jnp.asarray(geom.dsig, dtype)
    dp_norm = p * dsig / 1.0e5          # (L, ...) layer mass per 1e5 Pa
    q_gkg = q * 1000.0
    ones = jnp.ones_like(q)
    eps = jnp.stack([
        ABLWV2 * q_gkg * dp_norm,       # H2O rotation (strong)
        ABLCO2 * ones * dp_norm,        # CO2 15 um (well-mixed)
        ABLWIN * ones * dp_norm,        # window
        ABLWV1 * q_gkg * dp_norm,       # H2O vibration (weak)
    ])
    return jnp.exp(-_LW_DIFFUSIVITY * eps)


def four_band_radiation(p, tp, tt, q, g, t_sw, albedo, utc, geom,
                        declination=0.0):
    """Four-band longwave + grey shortwave column radiation.

    The band-resolved generalization of :func:`basic_grey_radiation`'s
    AD-2.7 ladders: the single grey LW transmittance ``t_lw ** dsig``
    becomes four spectral bands with the MITgcm/aim absorptivities the
    reference records for exactly this purpose (reference
    no_limits_2_5d.py:241-248, a constants-only stub there), and layer/
    ground emission is partitioned across bands by the exact Planck
    fraction at the emitting temperature (:func:`four_band_fractions`).
    The shortwave path (and the ground slab budget) is byte-identical to
    the grey scheme (grey_solar.py:390-394,398-403).

    Returns (dTdt [K/s] per layer, dt_ground [K/s]).
    """
    dtype = tt.dtype
    dsig = jnp.asarray(geom.dsig, dtype)
    sw_transmittance = jnp.asarray(t_sw ** dsig, dtype)

    # --- per-band LW ladders -------------------------------------------
    t_b = four_band_transmittances(p, q, geom, dtype)        # (4, L, ...)
    f_b = four_band_fractions(tt)                            # (4, L, ...)
    emission = f_b * (1 - t_b) * constants.sb_constant * tt ** 4

    # transmission from layer k down to the ground within each band:
    # EXCLUSIVE cumprod (prod over layers below k) — the grey scheme's
    # cumprod/t form (grey_solar.py:381) is 0/0 = NaN in a fully opaque
    # band (t = exp(-1.66*eps) underflows to 0 at aim's strong-H2O
    # absorptivity with the reference's hot-start humidities)
    cum_b_bottom = jnp.cumprod(t_b, axis=1)
    c_div = jnp.concatenate([jnp.ones_like(t_b[:, :1]),
                             cum_b_bottom[:, :-1]], axis=1)
    B = jnp.sum(emission * c_div, axis=(0, 1))               # at ground

    # --- grey SW sweep (identical to basic_grey_radiation) -------------
    cum_sw_trans_from_top = jnp.flip(
        jnp.cumprod(jnp.flip(jnp.broadcast_to(
            sw_transmittance.reshape(-1, *([1] * (tt.ndim - 1))),
            tt.shape), 0), axis=0), 0)
    sza = zenith_angle(jnp.asarray(geom.long, dtype),
                       jnp.asarray(geom.lat, dtype), utc, geom,
                       declination=declination)
    Sc = constants.solar_constant * sza
    S = (1 - albedo) * Sc * cum_sw_trans_from_top[0]
    U_s = constants.sb_constant * g.gt ** 4
    dt_ground = (B + S - U_s) / constants.Cg / 0.1

    # --- downwelling LW absorption per band, top->bottom ----------------
    def down_body(previous, xs):
        t_k, emit_k = xs
        absorbed = previous * (1 - t_k)
        return previous * t_k + emit_k, absorbed

    zero4 = jnp.zeros_like(emission[:, 0])
    _, LWA_a = jax.lax.scan(down_body, zero4,
                            (jnp.moveaxis(t_b, 1, 0),
                             jnp.moveaxis(emission, 1, 0)), reverse=True,
                            unroll=True)
    LWA_a = jnp.moveaxis(LWA_a, 0, 1).sum(0)                 # (L, ...)

    # --- upwelling from layer emission only (the reference's LWA_b
    # quirk: the ground term is analytic, grey_solar.py:513-518) --------
    _, LWA_b = jax.lax.scan(down_body, zero4,
                            (jnp.moveaxis(t_b, 1, 0),
                             jnp.moveaxis(emission, 1, 0)), unroll=True)
    LWA_b = jnp.moveaxis(LWA_b, 0, 1).sum(0)

    # ground emission absorbed at layer k, per band: partitioned by the
    # Planck fraction at the GROUND temperature
    fg = four_band_fractions(g.gt)                           # (4, ...)
    U_n = (fg[:, None] * U_s * c_div * (1 - t_b)).sum(0)

    S_n = ((1 - sw_transmittance.reshape(-1, *([1] * (tt.ndim - 1))))
           * cum_sw_trans_from_top
           / sw_transmittance.reshape(-1, *([1] * (tt.ndim - 1))) * Sc)

    B_n = emission.sum(0)
    dTdt = (U_n + S_n - 2 * B_n + LWA_a + LWA_b) * (
        constants.G / (constants.Cp * p * dsig))
    return dTdt, dt_ground
