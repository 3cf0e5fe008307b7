"""Shapiro FILTER/SHAP1D (stub-only in the reference, port.py:566-590)."""

import numpy as np
import jax.numpy as jnp

from gcmiipy_tpu.ops import shapiro


def test_shap1d_spectral_response():
    """Order-n response on wavenumber k must be 1 - sin^n(k dx / 2)."""
    W = 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(W))
    for order in (2, 4, 8):
        y = np.fft.rfft(np.asarray(shapiro.shap1d(x, order=order)))
        X = np.fft.rfft(np.asarray(x))
        k = np.arange(W // 2 + 1)
        expected = 1.0 - np.sin(np.pi * k / W) ** order
        np.testing.assert_allclose(y, X * expected, atol=1e-12)


def test_shap1d_kills_two_grid_wave_conserves_mean():
    W = 32
    zig = jnp.asarray((-1.0) ** np.arange(W))
    np.testing.assert_allclose(np.asarray(shapiro.shap1d(zig, 8)), 0.0,
                               atol=1e-15)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 5, W)))
    y = shapiro.shap1d(x, order=8)
    np.testing.assert_allclose(np.asarray(y).mean(-1),
                               np.asarray(x).mean(-1), atol=1e-14)
    const = jnp.full((W,), 3.7)
    np.testing.assert_allclose(np.asarray(shapiro.shap1d(const, 8)), 3.7,
                               rtol=1e-15)


def test_shap1d_rejects_odd_order():
    import pytest
    with pytest.raises(ValueError):
        shapiro.shap1d(jnp.zeros(8), order=3)


def test_driver_shapiro_cadence():
    """FILTER applies every k-th step: a 2-step run with cadence 3 matches
    the unfiltered run exactly; a 3-step run differs (p smoothed)."""
    from gcmiipy_tpu.model.config import ModelConfig
    from gcmiipy_tpu.model.driver import run_model

    base = dict(stats=False)
    off = ModelConfig(**base)
    on = ModelConfig(shapiro_every=3, shapiro_fields="pt", **base)

    for steps, same in ((2, True), (3, False)):
        p0, *_ = run_model(8, 16, 3, 900.0, steps, config=off)
        p1, *rest = run_model(8, 16, 3, 900.0, steps, config=on)
        equal = np.array_equal(np.asarray(p0), np.asarray(p1))
        assert equal == same, f"steps={steps}: expected same={same}"
        assert np.isfinite(np.asarray(p1)).all()


def test_shapiro_cadence_exact_across_checkpoint_chunks(tmp_path):
    """The FILTER cadence keys off the state's integer step counter, so a
    checkpoint-chunked run (scan restarts every k steps) applies it on
    exactly the same global steps as an unchunked run."""
    from gcmiipy_tpu.model.config import ModelConfig
    from gcmiipy_tpu.model.driver import run_model

    on = dict(shapiro_every=3, shapiro_fields="pt", stats=False,
              dtype="float64")
    plain = ModelConfig(**on)
    chunked = ModelConfig(checkpoint_dir=str(tmp_path), checkpoint_every=2,
                          **on)
    p0, *_ = run_model(8, 16, 3, 900.0, 7, config=plain)
    p1, *_ = run_model(8, 16, 3, 900.0, 7, config=chunked)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))


def _topo_setup(H=8, W=32, L=3, z_amp=1500.0):
    import dataclasses

    from gcmiipy_tpu import constants
    from gcmiipy_tpu.grid import geometry

    geom = geometry.gen_geometry(H, W, L, sig_func=geometry.manabe_sig)
    rng = np.random.default_rng(2)
    # half smooth (wavenumber 1) + half 2-grid-wave terrain: the Shapiro
    # filter passes k=1 untouched but removes the 2dx wave entirely, so a
    # raw filter visibly smears grid-scale orographic pressure signal
    x = np.arange(W)
    z = 0.5 * z_amp * ((1 + np.sin(2 * np.pi * x / W))
                       + (1.0 + (-1.0) ** x))[None, :] * np.ones((H, 1))
    geom = dataclasses.replace(geom, heightmap=jnp.asarray(z))
    sig = np.asarray(geom.sig).ravel()
    t = jnp.asarray(
        np.full((L, H, W), 300.0)
        * (constants.P0 / (1e5 * sig[:, None, None]
                           + float(geom.ptop))) ** constants.kappa)
    p = jnp.asarray(1e5 * (1 + 1e-3 * rng.standard_normal((H, W))))
    return geom, p, t


def test_shapiro_slp_flat_terrain_identity():
    """Over z=0 terrain the reduction factor is exactly 1: slp filtering
    equals raw filtering (module docstring claim)."""
    geom, p, t = _topo_setup(z_amp=0.0)
    raw, _ = shapiro.filter_prognostics(p, t, order=8, fields="p")
    red, _ = shapiro.filter_prognostics(p, t, order=8, fields="p",
                                        slp=True, geom=geom)
    np.testing.assert_allclose(np.asarray(red), np.asarray(raw),
                               rtol=1e-6, atol=1e-4)


def test_shapiro_slp_preserves_terrain_balanced_pressure():
    """A surface pressure in exact barometric balance with the terrain
    (constant sea-level pressure) passes through the SLP filter untouched,
    while the raw filter would smear the orographic signal — the point of
    GCM-II's MFILTR=1 'SEA LEVEL PRESSURE FILTER' (port.py:571)."""
    geom, p0, t = _topo_setup(z_amp=1500.0)
    # build p so that (p + ptop) * factor == const sea-level pressure;
    # factor depends (weakly) on p through T_1's pressure — iterate to
    # convergence so the balance is exact at f32
    psl = jnp.full(p0.shape, 101325.0, p0.dtype)
    ptop = jnp.asarray(geom.ptop, p0.dtype)
    p = psl - ptop
    for _ in range(40):
        p = psl / shapiro.slp_factor(p, t, geom) - ptop
    bal, _ = shapiro.filter_prognostics(p, t, order=8, fields="p",
                                        slp=True, geom=geom)
    np.testing.assert_allclose(np.asarray(bal), np.asarray(p),
                               rtol=2e-6, atol=0.5)
    raw, _ = shapiro.filter_prognostics(p, t, order=8, fields="p")
    # the raw filter visibly distorts the balanced field (> 10 Pa)
    assert np.abs(np.asarray(raw) - np.asarray(p)).max() > 10.0


def test_shapiro_slp_in_driver():
    """config.shapiro_slp threads through run_model and stays finite."""
    import dataclasses

    from gcmiipy_tpu.model.config import ModelConfig
    from gcmiipy_tpu.model.driver import run_model

    cfg = ModelConfig(shapiro_every=2, shapiro_fields="p", shapiro_slp=True,
                      stats=False)
    p, *rest = run_model(8, 16, 3, 900.0, 4, config=cfg)
    assert np.isfinite(np.asarray(p)).all()
