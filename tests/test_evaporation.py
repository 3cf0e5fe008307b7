"""Bulk-aerodynamic surface evaporation (beyond-reference: the reference
declares the component but leaves it empty, reference ``evaporation.py:5-9``)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gcmiipy_tpu import constants
from gcmiipy_tpu.grid import geometry
from gcmiipy_tpu.physics import evaporation, humidity, thermo


@pytest.fixture()
def setup():
    H, W, L = 4, 8, 3
    geom = geometry.gen_geometry(H, W, L, sig_func=geometry.manabe_sig)
    p = jnp.full((H, W), 1e5)
    sig = np.asarray(geom.sig).ravel()
    tp = 1e5 * sig[:, None, None] + float(geom.ptop) * np.ones((L, H, W))
    tt = jnp.asarray(np.full((L, H, W), 290.0))
    u = jnp.full((L, H, W), 5.0)
    v = jnp.zeros((L, H, W))
    q = jnp.full((L, H, W), 1e-3)          # dry air: big deficit
    gt = jnp.full((H, W), 300.0)
    gw = jnp.full((H, W), 0.1)
    return geom, p, q, u, v, tt, gt, gw


def test_flux_positive_and_wind_monotone(setup):
    geom, p, q, u, v, tt, gt, gw = setup
    E1 = evaporation.bulk_evaporation(p, q, u, v, tt, gt, gw, geom)
    assert np.all(np.asarray(E1) > 0)
    E2 = evaporation.bulk_evaporation(p, q, 3 * u, v, tt, gt, gw, geom)
    assert np.all(np.asarray(E2) > np.asarray(E1))


def test_zero_when_dry_or_saturated(setup):
    geom, p, q, u, v, tt, gt, gw = setup
    # dry ground: beta = 0
    E = evaporation.bulk_evaporation(p, q, u, v, tt, gt,
                                     jnp.zeros_like(gw), geom)
    np.testing.assert_array_equal(np.asarray(E), 0.0)
    # saturated (or supersaturated) lowest layer: clip at zero, no dew
    sig0 = np.asarray(geom.sig).ravel()[0]
    tp1 = p * sig0 + float(geom.ptop)
    q_sat = humidity.w_s_at(tp1, gt)
    q_wet = jnp.broadcast_to(2 * q_sat, q.shape)
    E = evaporation.bulk_evaporation(p, q_wet, u, v, tt, gt, gw, geom)
    np.testing.assert_array_equal(np.asarray(E), 0.0)


def test_step_budgets_close(setup):
    """Water leaving the ground equals water gained by the lowest layer,
    and the ground loses the matching latent heat."""
    geom, p, q, u, v, tt, gt, gw = setup
    dt = 600.0
    q_n, gt_n, gw_n = evaporation.evaporation_step(
        p, q, u, v, tt, gt, gw, dt, geom)
    # column water mass gained [kg/m^2]
    dsig0 = np.asarray(geom.dsig).ravel()[0]
    dp1 = np.asarray(p) * dsig0
    air_gain = np.asarray(q_n[0] - q[0]) * dp1 / constants.G
    ground_loss = np.asarray(gw - gw_n) * evaporation.RHO_WATER
    np.testing.assert_allclose(air_gain, ground_loss, rtol=1e-5)
    # latent cooling consistent with the flux
    cooling = np.asarray(gt - gt_n) * constants.Cg * evaporation.GROUND_SLAB
    np.testing.assert_allclose(cooling,
                               ground_loss * constants.lhv_water_0c / dt * dt,
                               rtol=1e-5)
    assert np.all(np.asarray(gw_n) >= 0)


def test_step_cannot_overdraw_ground_water(setup):
    geom, p, q, u, v, tt, gt, gw = setup
    tiny = jnp.full_like(gw, 1e-9)
    q_n, gt_n, gw_n = evaporation.evaporation_step(
        p, q, u, v, tt, gt, tiny, 3600.0, geom)
    assert np.all(np.asarray(gw_n) >= -1e-18)


def test_reference_signature_still_raises():
    with pytest.raises(NotImplementedError):
        evaporation.evaporation(None, None, None, None, None)


def test_driver_integration():
    """physics + evaporation runs finite; gw decreases, q[0] gains."""
    from gcmiipy_tpu.model.config import ModelConfig
    from gcmiipy_tpu.model.driver import gen_model_state, make_run_fn

    cfg = ModelConfig(physics=True, evaporation=True, gw0=0.05,
                      drag_tau=86400.0, stats=False, guard=False)
    geom = geometry.gen_geometry(8, 16, 3, sig_func=geometry.manabe_sig)
    state0 = gen_model_state(geom, cfg)
    run = make_run_fn(geom, cfg, timesteps=5)
    out = run(state0)
    state = out[0] if isinstance(out, tuple) else out
    assert np.isfinite(np.asarray(state.prog.p)).all()
    gw = np.asarray(state.ground.gw)
    assert np.all(gw <= 0.05) and gw.min() < 0.05  # water actually left
    assert np.all(gw >= 0)
