"""Geometry invariants: sigma ladder, spherical spacings, areas, polar mask."""

import math

import numpy as np
import pytest

from gcmiipy_tpu import constants
from gcmiipy_tpu.grid import geometry, topography


def test_sigma_ladder_sums_to_one():
    for sig_func in (geometry.equal_sig, geometry.manabe_sig):
        g = geometry.gen_geometry(4, 4, 9, sig_func=sig_func)
        np.testing.assert_allclose(np.sum(g.dsig), 1.0, rtol=1e-12)
        assert g.sige[0, 0, 0] == 1.0 and g.sige[-1, 0, 0] == 0.0
        np.testing.assert_allclose(g.sig, (g.sigb + g.sigt) / 2)


def test_manabe_sig_values():
    # sigma^2 (3 - 2 sigma) at endpoints and midpoint (reference geometry.py:30)
    assert geometry.manabe_sig(0) == 0
    assert geometry.manabe_sig(1) == 1
    assert geometry.manabe_sig(0.5) == 0.5


def test_latitudes_decrease_northward_first():
    # j decreases northward: lat[0] is the northernmost row (geometry.py:99)
    g = geometry.gen_geometry(24, 36, 9)
    lat = np.rad2deg(g.lat.ravel())
    assert lat[0] > lat[-1]
    np.testing.assert_allclose(lat[0], 90 - 0.5 * (180 / 24))
    np.testing.assert_allclose(lat[-1], -90 + 0.5 * (180 / 24))


def test_dx_shrinks_toward_poles():
    g = geometry.gen_geometry(24, 36, 3)
    dx = g.dx_j.ravel()
    assert dx[0] < dx[12]  # polar row narrower than equatorial
    circumference = 2 * math.pi * constants.radius
    np.testing.assert_allclose(
        dx[12], math.cos(math.radians(3.75)) * circumference / 36, rtol=1e-12)


def test_total_area_close_to_sphere():
    g = geometry.gen_geometry(48, 96, 3)
    total = float(np.sum(g.area) * g.width)
    sphere = 4 * math.pi * constants.radius ** 2
    assert abs(total - sphere) / sphere < 0.01


def test_square_geometry_uniform():
    g = geometry.gen_square_geometry(8, 8, 2, dx=1000.0, dy=1000.0)
    assert np.all(g.dx_j == 1000.0)
    assert np.all(g.area == 1e6)
    np.testing.assert_allclose(np.sum(g.dsig), 1.0)


def test_polar_mask_shape_and_range():
    g = geometry.gen_geometry(24, 36, 3)
    assert g.polar_mask.shape == (24, 36 // 2 + 1)
    assert np.all(g.polar_mask <= 1.0) and np.all(g.polar_mask >= 0.0)
    # mean (wavenumber 0) never damped
    assert np.all(g.polar_mask[:, 0] == 1.0)
    # equatorial rows unfiltered, polar rows damped at high wavenumbers
    assert np.all(g.polar_mask[12] == 1.0)
    assert g.polar_mask[0, -1] < 1.0


def test_pressure_from_heightmap_barometric():
    p = geometry.pressure_from_heightmap(0.0, 101325.0, 288.0)
    np.testing.assert_allclose(p, 101325.0)
    p5k = geometry.pressure_from_heightmap(5000.0, 101325.0, 288.0)
    assert 50000 < p5k < 60000  # ~ half an atmosphere at 5 km


def test_hansen_topography():
    topo = topography.calc_topography()
    land = topography.calc_land_cover()
    assert topo.shape == (24, 36) and land.shape == (24, 36)
    # decoded-map invariants: Everest-region '+' cells are 4500 m,
    # Antarctica row is 'R' = 100*17+1000 = 2700 m
    assert topo.max() == 4500.0
    np.testing.assert_allclose(topo[-1], np.full(36, 2700.0))
    assert np.all((land >= 0) & (land <= 1))
    np.testing.assert_allclose(land[-1], np.ones(36))  # Antarctica all land
    # checksums of the decode (verified against the reference decoder)
    np.testing.assert_allclose(topo.sum(), 362425.0)
    np.testing.assert_allclose(land.sum(), 299.925)


def test_giss_sige_ladder():
    """The historical GCM-II 9-layer SIGE table (reference geometry.py:45)
    builds a real geometry: edges match the table, dsig sums to 1."""
    geom = geometry.gen_geometry(24, 36, 9, sige_table=geometry.GISS_SIGE,
                                 ptop=1000.0)
    np.testing.assert_array_equal(geom.sige[:, 0, 0], geometry.GISS_SIGE)
    np.testing.assert_allclose(np.sum(geom.dsig), 1.0, rtol=1e-12)
    assert float(geom.ptop) == 1000.0
    # midpoints are strictly decreasing and inside (0, 1)
    sig = geom.sig[:, 0, 0]
    assert (np.diff(sig) < 0).all() and sig[0] < 1 and sig[-1] > 0


def test_sige_table_validation():
    import pytest
    with pytest.raises(ValueError):
        geometry.gen_geometry(8, 8, 3, sige_table=geometry.GISS_SIGE)
    with pytest.raises(ValueError):
        geometry.gen_geometry(8, 8, 9,
                              sige_table=geometry.GISS_SIGE[::-1].copy())
