"""Polar filter: spectral-damping semantics + matmul/FFT equivalence."""

import jax.numpy as jnp
import numpy as np

from gcmiipy_tpu.grid import geometry
from gcmiipy_tpu.ops import polar_filter


def _geom(h=8, w=16, l=3):
    return geometry.gen_geometry(h, w, l)


def test_constant_field_invariant():
    geom = _geom()
    q = jnp.full((3, 8, 16), 5.0)
    out = polar_filter.arakawa_1977(q, geom)
    np.testing.assert_allclose(out, q, atol=1e-12)


def test_zonal_mean_preserved():
    geom = _geom()
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(3, 8, 16)))
    out = polar_filter.arakawa_1977(q, geom)
    np.testing.assert_allclose(out.mean(axis=-1), q.mean(axis=-1), atol=1e-12)


def test_square_grid_identity_when_dy_equals_dx():
    # on a square grid with dy == dx, no wavenumber satisfies the damping
    # criterion 1/sin(pi n/I) > dy/dx, so the filter is the identity
    geom = geometry.gen_square_geometry(8, 16, 2, dx=1000.0, dy=1000.0)
    q = jnp.asarray(np.random.default_rng(1).normal(size=(8, 16)))
    out = polar_filter.arakawa_1977(q, geom)
    np.testing.assert_allclose(np.asarray(out), np.asarray(q), atol=1e-12)


def test_poles_damped_more_than_equator():
    geom = _geom(h=16, w=32)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(16, 32)))
    out = polar_filter.arakawa_1977(q, geom)
    mid = geom.height // 2
    # mask near the equator is close to 1; at the pole strongly damped
    assert np.all(geom.polar_mask[mid] > 0.99)
    assert geom.polar_mask[0, -1] < 0.2
    def hf_energy(row):
        spec = np.fft.rfft(np.asarray(row))
        return np.sum(np.abs(spec[8:]) ** 2)
    # polar row loses far more high-wavenumber energy than equatorial row
    assert hf_energy(out[0]) < hf_energy(q[0]) * 0.5
    assert hf_energy(out[mid]) > hf_energy(q[mid]) * 0.95


def test_explicit_spectrum_damping():
    # filtering IS multiplication of the rFFT spectrum by the mask
    geom = _geom(h=8, w=16)
    rng = np.random.default_rng(2)
    q = rng.normal(size=(8, 16))
    out = np.asarray(polar_filter.arakawa_1977(jnp.asarray(q), geom))
    expected = np.fft.irfft(np.fft.rfft(q, axis=-1) * geom.polar_mask,
                            n=16, axis=-1)
    np.testing.assert_allclose(out, expected, atol=1e-12)


def test_matmul_matches_fft():
    geom = _geom(h=8, w=16)
    F = polar_filter.build_filter_matrices(geom, dtype=np.float64)
    rng = np.random.default_rng(3)
    for shape in [(8, 16), (3, 8, 16)]:
        q = jnp.asarray(rng.normal(size=shape))
        a = polar_filter.arakawa_1977(q, geom)
        b = polar_filter.arakawa_1977_matmul(q, F)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)


def test_odd_width_supported():
    # the reference irfft breaks on odd I (low_pass.py:77); ours pins n=I
    geom = _geom(h=4, w=9)
    q = jnp.asarray(np.random.default_rng(4).normal(size=(4, 9)))
    out = polar_filter.arakawa_1977(q, geom)
    assert out.shape == q.shape
    np.testing.assert_allclose(out.mean(axis=-1), q.mean(axis=-1), atol=1e-12)


def test_width_one_passthrough():
    geom = geometry.gen_geometry(4, 1, 3)
    q = jnp.asarray(np.random.default_rng(5).normal(size=(3, 4, 1)))
    np.testing.assert_array_equal(polar_filter.arakawa_1977(q, geom), q)


def test_avrx_hard_cutoff():
    geom = _geom(h=8, w=16)
    q = jnp.asarray(np.random.default_rng(6).normal(size=(8, 16)))
    out = polar_filter.avrx(q, geom)
    assert out.shape == q.shape
    np.testing.assert_allclose(out.mean(axis=-1), q.mean(axis=-1), atol=1e-12)


def test_dft_matches_fft():
    # shared-matrix real-DFT factorization is exact in f64
    geom = _geom(h=8, w=16)
    mats = polar_filter.build_dft_matrices(16, np.float64)
    rng = np.random.default_rng(7)
    for shape in [(8, 16), (3, 8, 16)]:
        q = jnp.asarray(rng.standard_normal(shape))
        a = polar_filter.arakawa_1977(q, geom)
        b = polar_filter.arakawa_1977_dft(q, geom, mats)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-12)


def test_dft_odd_width():
    geom = _geom(h=4, w=9)
    mats = polar_filter.build_dft_matrices(9, np.float64)
    q = jnp.asarray(np.random.default_rng(8).standard_normal((4, 9)))
    a = polar_filter.arakawa_1977(q, geom)
    b = polar_filter.arakawa_1977_dft(q, geom, mats)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-12)
