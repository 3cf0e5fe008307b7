"""Thermodynamics and humidity property tests.

Mirrors the reference's roundtrip oracles: potential<->true temperature
(``temperature.py:30-41``) and RH<->MMR over a (T, p, RH) grid with 1e-6
tolerance (``humidity.py:63-84``).
"""

import jax.numpy as jnp
import numpy as np

from gcmiipy_tpu import constants
from gcmiipy_tpu.physics import humidity, isa, ozone, thermo


def test_temperature_roundtrip():
    tt = constants.standard_temperature
    p = constants.standard_pressure
    t = thermo.to_potential_temp(tt, p)
    tt2 = thermo.to_true_temp(t, p)
    np.testing.assert_allclose(tt2, tt, rtol=1e-12)


def test_potential_temp_exceeds_true_above_reference_pressure():
    # at p < P0 potential temperature is larger than true temperature
    t = thermo.to_potential_temp(250.0, 50000.0)
    assert t > 250.0


def test_density_ideal_gas():
    rho = thermo.to_density(288.0, 101325.0)
    np.testing.assert_allclose(rho, 101325.0 / (287.0 * 288.0))


def test_thbar_log_mean():
    # THBAR(T,T) = T; THBAR between bounds; matches closed form
    np.testing.assert_allclose(thermo.thbar(300.0, 300.0), 300.0, rtol=1e-9)
    t1, t2 = 310.0, 250.0
    expected = (np.log(t1) - np.log(t2)) / (1 / t2 - 1 / t1)
    np.testing.assert_allclose(thermo.thbar(t1, t2), expected, rtol=1e-12)
    assert 250.0 < float(thermo.thbar(t1, t2)) < 310.0


def test_humidity_roundtrip_grid():
    # brute-force roundtrip, reference humidity.py:73-84
    t = jnp.asarray(np.arange(0, 101, 10) + 273.15)[:, None, None]
    p = jnp.asarray((np.arange(1, 100, 7) + 1) * 10 * 100.0)[None, :, None]
    rh = jnp.asarray((np.arange(10) + 1) / 10)[None, None, :]
    mmr = humidity.rh_to_mmr(rh, p, t)
    rh_back = humidity.mmr_to_rh(mmr, p, t)
    np.testing.assert_allclose(rh_back, jnp.broadcast_to(rh, rh_back.shape),
                               atol=1e-6)


def test_manabe_rh_profile():
    # 0.77*(sig-0.02)/0.98: 0.77 at surface, negative above sigma=0.02
    np.testing.assert_allclose(humidity.manabe_rh(1.0), 0.77, rtol=1e-12)
    np.testing.assert_allclose(humidity.manabe_rh(0.02), 0.0, atol=1e-15)


def test_saturation_vapor_pressure_buck():
    # Buck at 0 C = 611.21 Pa; ~ doubles every 10 K
    np.testing.assert_allclose(
        humidity.saturation_vapor_pressure(273.15), 611.21, rtol=1e-6)
    e20 = float(humidity.saturation_vapor_pressure(293.15))
    assert 2300 < e20 < 2400  # ~2339 Pa at 20 C


def test_ozone_interp():
    # table endpoints clamp; interior interpolates monotonically in p segments
    v_low = float(ozone.ozone_at(1.0))
    np.testing.assert_allclose(v_low, ozone.O_VALUE[0])
    v_high = float(ozone.ozone_at(2.0e5))
    np.testing.assert_allclose(v_high, ozone.O_VALUE[-1])
    v_mid = float(ozone.ozone_at(500.0 * 100))
    assert ozone.O_VALUE.min() <= v_mid <= ozone.O_VALUE.max()


def test_isa_profile():
    # sea level ~ 19 C, tropopause region cold
    np.testing.assert_allclose(float(isa.temp_at(108900.0)), 19.0 + 273.15)
    assert float(isa.temp_at(22632.0)) < 230.0
