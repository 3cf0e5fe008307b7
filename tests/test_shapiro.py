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
