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
