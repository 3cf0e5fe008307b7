"""Physics cadence (physics_every) + seasonal declination (DAILY analog).

The reference applies physics every step (when not short-circuited,
no_limits_2_5d.py:79-115) at a fixed declination of 0 (grey_solar.py:60,
port.py:586-590 DAILY stub).  Here the extras run every ``physics_every``
steps with dt_eff = physics_every*dt, and ``seasonal`` drives declination
from the model clock; these tests pin the cadence arithmetic and the
declination anchors.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcmiipy_tpu.dynamics import core25d
from gcmiipy_tpu.grid import geometry
from gcmiipy_tpu.model.config import ModelConfig
from gcmiipy_tpu.model import driver as drv
from gcmiipy_tpu.physics import radiation


def test_physics_every_manual_composition():
    """xla + physics_every=2 over 4 steps == hand-rolled
    [dyn, dyn, phys(2dt)] x2 with the reference call order (physics sees
    the utc of the step that triggered it)."""
    cfg = ModelConfig(physics=True, physics_every=2, dtype="float64",
                      backend="xla", stats=False, dt=600.0)
    out = drv.run_model(8, 16, 3, 600.0, 4, config=cfg)

    geom = geometry.gen_geometry(8, 16, 3,
                                 sig_func=geometry.manabe_sig
                                 ).astype(np.float64)
    state = drv.gen_model_state(geom, cfg)
    prog, g = state.prog, state.ground
    p, u, v, t, q = prog
    utc = 0.0
    for s in range(4):
        p, u, v, t, q = core25d.matsuno_timestep(p, u, v, t, q, 600.0, geom)
        if (s + 1) % 2 == 0:
            t, g = drv.solar_timestep(t, p, g, 1200.0, utc, geom, cfg)
        utc += 600.0
    for name, a, b in zip("puvtq", (p, u, v, t, q), out[:5]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-12, atol=1e-12,
                                   err_msg=f"field {name}")
    np.testing.assert_allclose(np.asarray(out[5].gt), np.asarray(g.gt),
                               rtol=1e-12)


def test_physics_every_one_matches_legacy_every_step():
    """physics_every=1 (the default) is the reference per-step semantics."""
    kw = dict(physics=True, dtype="float64", backend="xla", stats=False,
              drag_tau=86400.0, dt=600.0)
    out1 = drv.run_model(8, 16, 3, 600.0, 3,
                         config=ModelConfig(physics_every=1, **kw))
    geom = geometry.gen_geometry(8, 16, 3,
                                 sig_func=geometry.manabe_sig
                                 ).astype(np.float64)
    cfg = ModelConfig(physics_every=1, **kw)
    state = drv.gen_model_state(geom, cfg)
    filter_fn = drv.make_filter_fn(cfg, geom)
    for _ in range(3):
        state = drv.full_timestep(state, geom, cfg, filter_fn)
    for name, a, b in zip("puvtq", state.prog, out1[:5]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-12, atol=1e-12,
                                   err_msg=f"field {name}")


def test_validate_config_evaporation_needs_physics():
    cfg = ModelConfig(evaporation=True, gw0=0.05)
    with pytest.raises(ValueError, match="physics=True"):
        drv.validate_config(cfg)


def test_validate_config_bad_cadence():
    with pytest.raises(ValueError, match="physics_every"):
        drv.validate_config(ModelConfig(physics_every=0))


def test_solar_declination_anchors():
    """delta = -obliquity at the winter solstice anchor (utc=0 is Jan 1;
    d+10 = 365 -> cos = 1), ~0 at the equinox quarter, +obliquity at the
    summer anchor."""
    day = 86400.0
    eps = math.radians(23.44)
    # Dec 22 of year 0 (d = 355): d + 10 = 365 -> -obliquity exactly
    np.testing.assert_allclose(
        float(radiation.solar_declination(355.0 * day)), -eps, atol=1e-12)
    # d + 10 = 365/4 -> cos(pi/2) = 0 (spring equinox ~Mar 23)
    d_eq = 365.0 / 4 - 10.0
    np.testing.assert_allclose(
        float(radiation.solar_declination(d_eq * day)), 0.0, atol=1e-12)
    # d + 10 = 365/2 -> +obliquity (northern summer)
    d_sum = 365.0 / 2 - 10.0
    np.testing.assert_allclose(
        float(radiation.solar_declination(d_sum * day)), eps, atol=1e-12)
    # seasonal zenith: at the north pole the sun never rises at the
    # winter anchor and never sets at the summer anchor
    lat = jnp.asarray([[math.radians(89.0)]])
    longs = jnp.asarray([0.0])
    geom = geometry.gen_geometry(1, 1, 1)
    dec_w = radiation.solar_declination(355.0 * day)
    dec_s = radiation.solar_declination(d_sum * day)
    za_w = [np.asarray(radiation.zenith_angle(longs, lat, h * 3600.0, geom,
                                              declination=dec_w)).item()
            for h in range(0, 24, 3)]
    za_s = [np.asarray(radiation.zenith_angle(longs, lat, h * 3600.0, geom,
                                              declination=dec_s)).item()
            for h in range(0, 24, 3)]
    assert max(za_w) == 0.0          # polar night
    assert min(za_s) > 0.0           # midnight sun


def test_seasonal_run_stable():
    """A short physics-on seasonal run stays guarded-healthy and differs
    from the perpetual-equinox run (the declination is actually wired)."""
    kw = dict(physics=True, convection=True, drag_tau=86400.0,
              dtype="float64", backend="xla", guard=True, stats=False)
    # start mid-January (utc anchor 0 = Jan 1): strong NH winter tilt
    steps = 96
    out_eq = drv.run_model(8, 16, 3, 1800.0, steps,
                           config=ModelConfig(seasonal=False, **kw))
    out_se = drv.run_model(8, 16, 3, 1800.0, steps,
                           config=ModelConfig(seasonal=True, **kw))
    for x in out_se[:5]:
        assert np.isfinite(np.asarray(x)).all()
    # temperature fields must differ measurably under the tilted sun
    dt_ = np.max(np.abs(np.asarray(out_se[3]) - np.asarray(out_eq[3])))
    assert dt_ > 1e-3


def test_seasonal_driver_matches_oracle():
    """Three seasonal physics-on driver steps == the NumPy oracle with the
    clock-driven declination (DAILY end-to-end parity, f64)."""
    from gcmiipy_tpu.oracle import numpy_radiation as rad_np
    from gcmiipy_tpu.oracle import numpy_ref

    geom = geometry.gen_geometry(8, 12, 3,
                                 sig_func=geometry.manabe_sig
                                 ).astype(np.float64)
    # start mid-year so the declination is far from the equinox value
    utc0 = 170.0 * 86400.0
    cfg = ModelConfig(dt=900.0, physics=True, seasonal=True,
                      dtype="float64", stats=False)
    state = drv.gen_model_state(geom, cfg)
    state = state._replace(utc=jnp.asarray(utc0, jnp.float64))
    filter_fn = drv.make_filter_fn(cfg, geom)
    for _ in range(3):
        state = drv.full_timestep(state, geom, cfg, filter_fn)

    prog0 = drv.gen_model_state(geom, cfg).prog
    o = tuple(np.asarray(x) for x in prog0)
    gt = np.asarray(drv.gen_model_state(geom, cfg).ground.gt)
    for i in range(3):
        utc = utc0 + i * 900.0
        o = numpy_ref.matsuno_timestep_np(*o, 900.0, geom)
        p_i, u_i, v_i, t_i, q_i = o
        decl = rad_np.solar_declination_np(utc)
        t_i, gt = rad_np.solar_timestep_np(
            t_i, p_i, gt, 900.0, utc, cfg.t_lw, cfg.t_sw, cfg.albedo,
            geom, declination=decl)
        o = (p_i, u_i, v_i, t_i, q_i)

    for name, a, b in zip("puvtq", o, state.prog):
        np.testing.assert_allclose(np.asarray(b), a, rtol=1e-9, atol=1e-9,
                                   err_msg=f"field {name}")
    np.testing.assert_allclose(np.asarray(state.ground.gt), gt, rtol=1e-9)
    # and the declination genuinely moved the sun: an equinox oracle
    # composition must NOT match
    t_eq, _ = rad_np.solar_timestep_np(
        o[3], o[0], gt, 900.0, utc0, cfg.t_lw, cfg.t_sw, cfg.albedo,
        geom, declination=0.0)
    t_se, _ = rad_np.solar_timestep_np(
        o[3], o[0], gt, 900.0, utc0, cfg.t_lw, cfg.t_sw, cfg.albedo,
        geom, declination=rad_np.solar_declination_np(utc0))
    assert np.max(np.abs(t_eq - t_se)) > 1e-8
