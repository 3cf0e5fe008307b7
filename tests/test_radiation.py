"""Grey-gas radiation: geometry of insolation, transfer sweeps, equilibrium.

The reference exercises radiation through interactive runs
(``test_geography.py:49``: a 1 x 16 x 17 column-physics run); here the same
behavior is pinned with assertions: zenith geometry, monotone SW extinction,
energy-budget signs and a cooling-towards-equilibrium integration.
"""

import math

import jax.numpy as jnp
import numpy as np

from gcmiipy_tpu import constants
from gcmiipy_tpu.grid import geometry
from gcmiipy_tpu.model.config import ModelConfig
from gcmiipy_tpu.model.driver import run_model
from gcmiipy_tpu.model.state import GroundVars
from gcmiipy_tpu.physics import radiation, thermo


def test_solar_zenith_angle_basics():
    # sun overhead: lat=declination, hour angle 0
    np.testing.assert_allclose(
        float(radiation.solar_zenith_angle(0.0, 0.0, 0.0)), 1.0)
    # poles with zero declination: grazing
    np.testing.assert_allclose(
        float(radiation.solar_zenith_angle(math.pi / 2, 0.0, 0.0)), 0.0,
        atol=1e-12)


def test_zenith_angle_grid_day_night():
    geom = geometry.gen_geometry(8, 16, 3)
    sza0 = radiation.zenith_angle(jnp.asarray(geom.long),
                                  jnp.asarray(geom.lat), 0.0, geom)
    assert sza0.shape == (8, 16)
    # clamped non-negative; some cells in daylight, some at night
    assert float(sza0.min()) == 0.0
    assert float(sza0.max()) > 0.9
    # 12 hours later the subsolar longitude flipped by ~180 degrees
    sza12 = radiation.zenith_angle(jnp.asarray(geom.long),
                                   jnp.asarray(geom.lat), 12 * 3600.0, geom)
    # 12 hours = 180 degrees: the insolation pattern shifts by 8 of 16 cells
    np.testing.assert_allclose(np.asarray(sza12),
                               np.roll(np.asarray(sza0), 8, axis=1),
                               atol=1e-12)


def test_daily_average_irradiance_equator():
    # equator, equinox: Sc/pi * cos(0) * sin(pi/2) (reference grey_solar.py:32-36)
    manabe_sc = 2 * 41840.0 / 60.0
    expected = manabe_sc / math.pi
    np.testing.assert_allclose(
        float(radiation.daily_average_irradiance(0.0, 0.0)), expected,
        rtol=1e-12)


def test_hansen_cloud_thickness():
    # cold -> 1/3; warm high-pressure -> linear in (p - 100 hPa); negatives clamp
    th = radiation.hansen_cloud_thickness(jnp.asarray([85000.0]),
                                          jnp.asarray([280.0]))
    np.testing.assert_allclose(np.asarray(th), [(85000 - 10000) * 0.0133 / 100])
    th_cold = radiation.hansen_cloud_thickness(jnp.asarray([85000.0]),
                                               jnp.asarray([250.0]))
    np.testing.assert_allclose(np.asarray(th_cold), [1 / 3])
    th_neg = radiation.hansen_cloud_thickness(jnp.asarray([5000.0]),
                                              jnp.asarray([280.0]))
    np.testing.assert_allclose(np.asarray(th_neg), [0.0])


def test_compute_absorbance():
    rho = jnp.full((3, 2, 2), 1.2)
    path = jnp.full((3, 2, 2), 100.0)
    zero = radiation.compute_absorbance([], rho, path)
    np.testing.assert_allclose(np.asarray(zero), 0.0)
    one = radiation.compute_absorbance([(0.01, 0.125)], rho, path)
    np.testing.assert_allclose(np.asarray(one), 0.01 * 1.2 * 100 * 0.125)


def _column(geom, tt0=300.0):
    L, H, W = geom.layers, geom.height, geom.width
    p = jnp.full((H, W), 1.0e5)
    sig = jnp.asarray(geom.sig)
    tp = p * sig + float(geom.ptop)
    tt = jnp.full((L, H, W), tt0)
    t = thermo.to_potential_temp(tt, tp)
    q = jnp.full((L, H, W), 1e-3)
    g = GroundVars(jnp.full((H, W), tt0), jnp.zeros((H, W)),
                   jnp.zeros((H, W)), jnp.zeros((H, W)))
    return p, tp, tt, t, q, g


def test_grey_solar_monotone_downwelling():
    geom = geometry.gen_geometry(4, 4, 9, sig_func=geometry.manabe_sig)
    p, tp, tt, t, q, g = _column(geom)
    t_n, downwelling = radiation.grey_solar(p, q, t, 0.0, g.gt, 0.0, 600.0,
                                            geom)
    dw = np.asarray(downwelling)
    # SW flux only extinguishes going down (no cloud, c=0)
    assert np.all(np.diff(dw, axis=0) >= -1e-9)
    assert np.isfinite(np.asarray(t_n)).all()


def test_grey_radiation_budget():
    geom = geometry.gen_geometry(4, 4, 9, sig_func=geometry.manabe_sig)
    p, tp, tt, t, q, g = _column(geom, tt0=300.0)
    dt_ground, dt_air, toa_up = radiation.grey_radiation(
        p, q, tt, 0.3, g, None, 600.0, geom)
    assert np.isfinite(np.asarray(dt_ground)).all()
    assert np.isfinite(np.asarray(dt_air)).all()
    # TOA thermal upwelling is positive (the column emits to space)
    assert np.all(np.asarray(toa_up) > 0)


def test_basic_grey_radiation_hot_atmosphere_cools():
    geom = geometry.gen_geometry(4, 4, 9, sig_func=geometry.manabe_sig)
    p, tp, tt, t, q, g = _column(geom, tt0=360.0)
    dTdt, dt_ground = radiation.basic_grey_radiation(
        p, tp, tt, g, 0.1, 0.9, 0.3, 0.0, geom)
    assert np.isfinite(np.asarray(dTdt)).all()
    assert np.isfinite(np.asarray(dt_ground)).all()
    # a 360 K atmosphere radiates far more than it absorbs: net cooling
    assert float(jnp.mean(dTdt)) < 0


def _random_column(geom, seed=0):
    """Random (but physical) f64 fields exercising clouds/day/night."""
    rng = np.random.default_rng(seed)
    L, H, W = geom.layers, geom.height, geom.width
    p = jnp.asarray(1e5 * (1 + 0.02 * rng.standard_normal((H, W))))
    sig = jnp.asarray(geom.sig)
    tp = p * sig + float(geom.ptop)
    tt = jnp.asarray(260.0 + 60.0 * rng.random((L, H, W)))
    t = thermo.to_potential_temp(tt, tp)
    q = jnp.asarray(10.0 ** rng.uniform(-5, -2, (L, H, W)))
    g = GroundVars(jnp.asarray(270.0 + 50.0 * rng.random((H, W))),
                   jnp.zeros((H, W)), jnp.zeros((H, W)), jnp.zeros((H, W)))
    return p, tp, tt, t, q, g


def test_basic_grey_radiation_oracle_parity():
    """JAX basic_grey_radiation == loop-based NumPy transcription of
    reference grey_solar.py:358-563 at f64 roundoff."""
    from gcmiipy_tpu.oracle import numpy_radiation as rad_np
    geom = geometry.gen_geometry(6, 8, 9, sig_func=geometry.manabe_sig)
    p, tp, tt, t, q, g = _random_column(geom, seed=1)
    utc = 5 * 3600.0
    dTdt, dtg = radiation.basic_grey_radiation(p, tp, tt, g, 0.1, 0.9, 0.3,
                                               utc, geom)
    dTdt_o, dtg_o = rad_np.basic_grey_radiation_np(
        p, tp, tt, g.gt, 0.1, 0.9, 0.3, utc, geom)
    np.testing.assert_allclose(np.asarray(dTdt), dTdt_o, rtol=1e-11,
                               atol=1e-16)
    np.testing.assert_allclose(np.asarray(dtg), dtg_o, rtol=1e-11,
                               atol=1e-16)


def test_grey_solar_oracle_parity():
    from gcmiipy_tpu.oracle import numpy_radiation as rad_np
    geom = geometry.gen_geometry(6, 8, 9, sig_func=geometry.manabe_sig)
    p, tp, tt, t, q, g = _random_column(geom, seed=2)
    t_n, dw = radiation.grey_solar(p, q, t, 0.4, g.gt, 0.0, 600.0, geom)
    t_n_o, dw_o = rad_np.grey_solar_np(p, q, t, 0.4, g.gt, 0.0, 600.0, geom)
    np.testing.assert_allclose(np.asarray(t_n), t_n_o, rtol=1e-11)
    np.testing.assert_allclose(np.asarray(dw), dw_o, rtol=1e-11, atol=1e-12)


def test_grey_radiation_oracle_parity():
    from gcmiipy_tpu.oracle import numpy_radiation as rad_np
    geom = geometry.gen_geometry(6, 8, 9, sig_func=geometry.manabe_sig)
    p, tp, tt, t, q, g = _random_column(geom, seed=3)
    dtg, dta, toa = radiation.grey_radiation(p, q, tt, 0.3, g, None, 600.0,
                                             geom)
    dtg_o, dta_o, toa_o = rad_np.grey_radiation_np(p, q, tt, 0.3, g.gt,
                                                   None, 600.0, geom)
    np.testing.assert_allclose(np.asarray(dtg), dtg_o, rtol=1e-11,
                               atol=1e-16)
    np.testing.assert_allclose(np.asarray(dta), dta_o, rtol=1e-11,
                               atol=1e-16)
    np.testing.assert_allclose(np.asarray(toa), toa_o, rtol=1e-11)


def test_grey_radiation_budget_closes():
    """Column energy conservation: integrated air+ground heating equals
    net flux in at the boundaries (incoming SW minus cloud-reflected SW,
    the ground-albedo SW leak, and TOA LW escape).  Would fail with the
    SW/LW sweeps swapped, a sign slip, or a dropped absorption term."""
    from gcmiipy_tpu.oracle import numpy_radiation as rad_np
    geom = geometry.gen_geometry(6, 8, 9, sig_func=geometry.manabe_sig)
    p, tp, tt, t, q, g = _random_column(geom, seed=4)
    c = 0.3
    dtg_o, dta_o, toa_o, fx = rad_np.grey_radiation_np(
        p, q, tt, c, g.gt, None, 600.0, geom, return_fluxes=True)
    sig = np.asarray(geom.sig)
    dsig = np.asarray(geom.dsig)
    tp_np = np.asarray(p)[None] * sig + float(geom.ptop)
    rho = tp_np / (constants.Rd * np.asarray(tt))
    depth = np.asarray(p) * dsig / (rho * constants.G)
    air_heat = np.sum(constants.Cp * rho * depth * dta_o, axis=0)
    ground_heat = constants.Cg * 0.1 * dtg_o
    net_in = (fx["irradiance"] - fx["reflected"] - fx["sw_ground_leak"]
              - fx["toa_up"])
    np.testing.assert_allclose(air_heat + ground_heat, net_in,
                               rtol=1e-10, atol=1e-8)
    # and the JAX twin inherits closure through the 1e-11 parity test


def test_basic_grey_radiation_budget_closes():
    """Same closure for the driver-wired basic grey atmosphere: heating
    integral == absorbed solar minus the two LW escape routes (ground
    emission through the column + the emission-only upwelling ladder top)
    minus the ground-albedo reflection."""
    from gcmiipy_tpu.oracle import numpy_radiation as rad_np
    geom = geometry.gen_geometry(6, 8, 9, sig_func=geometry.manabe_sig)
    p, tp, tt, t, q, g = _random_column(geom, seed=5)
    utc = 7 * 3600.0
    dTdt_o, dtg_o, fx = rad_np.basic_grey_radiation_np(
        p, tp, tt, g.gt, 0.1, 0.9, 0.3, utc, geom, return_fluxes=True)
    dsig = np.asarray(geom.dsig)
    air_heat = np.sum(
        dTdt_o * constants.Cp * np.asarray(p) * dsig / constants.G, axis=0)
    ground_heat = constants.Cg * 0.1 * dtg_o
    net_in = (fx["Sc"] - fx["sw_reflected"] - fx["lw_escape_ground"]
              - fx["lw_escape_layers"])
    np.testing.assert_allclose(air_heat + ground_heat, net_in,
                               rtol=1e-10, atol=1e-8)


def test_physics_driver_matches_oracle():
    """Five physics-on driver steps == NumPy oracle (dynamics + radiation
    composed exactly as reference no_limits_2_5d.full_timestep would with
    its early return removed): f64 end-to-end parity."""
    import jax

    from gcmiipy_tpu.model import driver as driver_mod
    from gcmiipy_tpu.model.state import ModelState, PrognosticVars
    from gcmiipy_tpu.oracle import numpy_radiation as rad_np
    from gcmiipy_tpu.oracle import numpy_ref

    geom = geometry.gen_geometry(8, 12, 5, sig_func=geometry.manabe_sig)
    geom = geom.astype(np.float64)
    cfg = ModelConfig(dt=600.0, physics=True, dtype="float64", stats=False)
    rng = np.random.default_rng(6)
    H, W, L = 8, 12, 5
    p0 = 1e5 * (1 + 1e-3 * rng.standard_normal((H, W)))
    u0 = 0.5 * rng.standard_normal((L, H, W))
    v0 = 0.5 * rng.standard_normal((L, H, W))
    sig = np.asarray(geom.sig)
    tp0 = p0[None] * sig + float(geom.ptop)
    tt0 = 280.0 + 5 * rng.standard_normal((L, H, W))
    t0 = tt0 * (constants.P0 / tp0) ** constants.kappa
    q0 = 1e-5 * (1 + 0.1 * rng.random((L, H, W)))
    gt0 = 300.0 + 5 * rng.standard_normal((H, W))

    state = ModelState(
        PrognosticVars(*(jnp.asarray(x) for x in (p0, u0, v0, t0, q0))),
        GroundVars(jnp.asarray(gt0), jnp.zeros((H, W)), jnp.zeros((H, W)),
                   jnp.zeros((H, W))),
        jnp.asarray(0.0), jnp.asarray(0, jnp.int32))
    filter_fn = driver_mod.make_filter_fn(cfg, geom)
    for _ in range(5):
        state = driver_mod.full_timestep(state, geom, cfg, filter_fn)

    # oracle: dynamics step then radiation step, per step
    o = (p0, u0, v0, t0, q0)
    gt = gt0
    for i in range(5):
        o = numpy_ref.matsuno_timestep_np(*o, 600.0, geom)
        p_i, u_i, v_i, t_i, q_i = o
        t_i, gt = rad_np.solar_timestep_np(t_i, p_i, gt, 600.0, i * 600.0,
                                           cfg.t_lw, cfg.t_sw, cfg.albedo,
                                           geom)
        o = (p_i, u_i, v_i, t_i, q_i)

    for name, a, b in zip("puvtq", o, state.prog):
        np.testing.assert_allclose(np.asarray(b), a, rtol=1e-9, atol=1e-9,
                                   err_msg=f"field {name}")
    np.testing.assert_allclose(np.asarray(state.ground.gt), gt, rtol=1e-10)


def test_column_physics_run():
    # the reference column-physics configuration shape (test_geography.py:49),
    # shortened: 1 x 16 x 17, dt = 30 min, 100 steps with radiation enabled
    cfg = ModelConfig(physics=True, dtype="float64")
    p, u, v, t, q, g, geom, stats = run_model(1, 16, 17, 1800.0, 100,
                                              config=cfg)
    for x in (p, u, v, t, q, g.gt):
        assert np.isfinite(np.asarray(x)).all()
    gt = np.asarray(g.gt)
    # physically bounded: nightside cools below 360 K, dayside may warm
    # transiently under the strong (t_lw = 0.1) greenhouse
    assert 250.0 < gt.min() < 360.0
    assert gt.max() < 450.0
    # diurnal structure: the ground is warmest where the sun has been
    assert gt.max() - gt.min() > 10.0


# ---- four-band LW scheme (ModelConfig.radiation = "4band") ----------------

def test_four_band_fractions_properties():
    """Band fractions sum to 1, match the exact Planck series to the fit
    tolerance, and behave physically (hotter -> more window emission)."""
    from gcmiipy_tpu.oracle import numpy_radiation as rad_np
    T = np.linspace(160.0, 340.0, 37)
    f_poly = np.asarray(radiation.four_band_fractions(jnp.asarray(T)))
    np.testing.assert_allclose(f_poly.sum(0), 1.0, atol=1e-12)
    f_exact = rad_np.four_band_fractions_np(T, exact=True)
    np.testing.assert_allclose(f_poly, f_exact, atol=5e-4)
    # Wien shift: the short-wavenumber rotation band loses share with T,
    # the window band gains
    assert f_exact[0, -1] < f_exact[0, 0]
    assert f_exact[2, -1] > f_exact[2, 0]
    # at 288 K most emission sits below 1200 cm^-1
    f288 = rad_np.four_band_fractions_np(np.asarray([288.0]), exact=True)
    assert f288[:3].sum() > 0.8


def test_four_band_transmittance_limits():
    """Dry columns are transparent in the H2O bands; heavier layers
    absorb more everywhere."""
    geom = geometry.gen_geometry(4, 8, 9, sig_func=geometry.manabe_sig)
    p = jnp.full((4, 8), 1.0e5)
    q0 = jnp.zeros((9, 4, 8))
    t_dry = np.asarray(radiation.four_band_transmittances(p, q0, geom))
    np.testing.assert_allclose(t_dry[0], 1.0, atol=1e-12)   # strong H2O
    np.testing.assert_allclose(t_dry[3], 1.0, atol=1e-12)   # weak H2O
    assert (t_dry[1] < 1.0).all() and (t_dry[2] < 1.0).all()
    q1 = jnp.full((9, 4, 8), 1e-3)
    t_wet = np.asarray(radiation.four_band_transmittances(p, q1, geom))
    assert (t_wet[0] < t_dry[0]).all()
    # the strong band absorbs far more than the weak one at equal q
    assert (t_wet[0] < t_wet[3]).all()


def test_four_band_radiation_oracle_parity():
    from gcmiipy_tpu.oracle import numpy_radiation as rad_np
    geom = geometry.gen_geometry(6, 8, 9, sig_func=geometry.manabe_sig)
    p, tp, tt, t, q, g = _random_column(geom, seed=11)
    utc = 5 * 3600.0
    dTdt, dtg = radiation.four_band_radiation(p, tp, tt, q, g, 0.9, 0.3,
                                              utc, geom)
    dTdt_o, dtg_o = rad_np.four_band_radiation_np(
        p, tp, tt, q, g.gt, 0.9, 0.3, utc, geom)
    np.testing.assert_allclose(np.asarray(dTdt), dTdt_o, rtol=1e-11,
                               atol=1e-16)
    np.testing.assert_allclose(np.asarray(dtg), dtg_o, rtol=1e-11,
                               atol=1e-16)


def test_four_band_radiation_budget_closes():
    """Column energy conservation for the four-band scheme: integrated
    air+ground heating == net boundary flux (absorbed solar minus the
    per-band LW escapes)."""
    from gcmiipy_tpu.oracle import numpy_radiation as rad_np
    geom = geometry.gen_geometry(6, 8, 9, sig_func=geometry.manabe_sig)
    p, tp, tt, t, q, g = _random_column(geom, seed=12)
    utc = 7 * 3600.0
    dTdt_o, dtg_o, fx = rad_np.four_band_radiation_np(
        p, tp, tt, q, g.gt, 0.9, 0.3, utc, geom, return_fluxes=True)
    dsig = np.asarray(geom.dsig)
    air_heat = np.sum(
        dTdt_o * constants.Cp * np.asarray(p) * dsig / constants.G, axis=0)
    ground_heat = constants.Cg * 0.1 * dtg_o
    net_in = (fx["Sc"] - fx["sw_reflected"] - fx["lw_escape_ground"]
              - fx["lw_escape_layers"])
    np.testing.assert_allclose(air_heat + ground_heat, net_in,
                               rtol=1e-10, atol=1e-8)


def test_four_band_driver_run():
    """A physics-on driver run with radiation='4band' integrates stably
    (guard ON and asserted quiet — a frozen blown run must FAIL here,
    which is how the fully-opaque-band 0/0 slipped past the first
    version of this test) and differs measurably from the grey scheme."""
    import warnings

    from gcmiipy_tpu.model.config import ModelConfig
    from gcmiipy_tpu.model.driver import run_model

    kw = dict(physics=True, convection=True, drag_tau=86400.0,
              dtype="float64", backend="xla", guard=True, stats=False)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out_g = run_model(8, 16, 3, 1800.0, 24,
                          config=ModelConfig(radiation="grey", **kw))
        out_4 = run_model(8, 16, 3, 1800.0, 24,
                          config=ModelConfig(radiation="4band", **kw))
    blown = [w for w in caught if "blew up" in str(w.message)]
    assert not blown, f"guarded run blew up: {blown[0].message}"
    for x in out_4[:5]:
        assert np.isfinite(np.asarray(x)).all()
    dT = np.max(np.abs(np.asarray(out_4[3]) - np.asarray(out_g[3])))
    assert dT > 1e-3
