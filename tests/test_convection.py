"""Dry convective adjustment (beyond-reference; physics/convection.py)."""

import jax.numpy as jnp
import numpy as np

from gcmiipy_tpu import constants
from gcmiipy_tpu.grid import geometry
from gcmiipy_tpu.physics import convection


def _column(L=9, surface_hot=60.0):
    geom = geometry.gen_geometry(1, 1, L, sig_func=geometry.manabe_sig)
    p = 1e5
    tp = (p * np.asarray(geom.sig) + float(geom.ptop)).reshape(L, 1, 1)
    dp = (p * np.asarray(geom.dsig)).reshape(L, 1, 1)
    # a strongly superadiabatic profile: hot surface, isothermal aloft
    tt = np.full((L, 1, 1), 280.0)
    tt[0] += surface_hot
    tt[1] += surface_hot / 2
    return jnp.asarray(tt), jnp.asarray(tp), jnp.asarray(dp)


def _lapse(tt, tp):
    tt, tp = np.asarray(tt)[:, 0, 0], np.asarray(tp)[:, 0, 0]
    tbar = 0.5 * (tt[:-1] + tt[1:])
    dz = constants.Rd * tbar / constants.G * np.log(tp[:-1] / tp[1:])
    return (tt[:-1] - tt[1:]) / dz


def test_adjustment_removes_superadiabat_conserving_enthalpy():
    tt, tp, dp = _column()
    out = convection.convective_adjustment(tt, tp, dp)
    # enthalpy conserved
    np.testing.assert_allclose(float(jnp.sum(out * dp)),
                               float(jnp.sum(tt * dp)), rtol=1e-12)
    # no interface is superadiabatic beyond the critical lapse (+eps)
    assert (_lapse(out, tp) <= convection.CRITICAL_LAPSE * (1 + 1e-4)).all()


def test_stable_profile_untouched():
    tt, tp, dp = _column(surface_hot=0.0)
    # isothermal: lapse 0 < critical -> exactly unchanged
    out = convection.convective_adjustment(tt, tp, dp)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(tt))


def test_longrun_physics_with_convection_and_drag_is_stable():
    """The flagship physics-on run blows up WITHOUT any convection or
    friction (both missing from the reference: thermodynamic column
    destabilizes at ~6308; with convection alone the radiatively driven
    circulation's KE runs away at ~6733).  With the Manabe-Strickler
    adjustment + a 2-day Rayleigh surface drag (the SDRAG/friction subs
    the reference stubs, port.py:539-599) the FULL 14400-step reference
    main() horizon integrates with the guard clean."""
    from gcmiipy_tpu.model import driver
    from gcmiipy_tpu.model.config import ModelConfig

    config = ModelConfig(dt=1800.0, dtype="float64", physics=True,
                         convection=True, drag_tau=2 * 86400.0, guard=True)
    geom = geometry.gen_geometry(8, 8, 3, sig_func=geometry.manabe_sig)
    state = driver.gen_model_state(geom, config)
    out_state, stats, info = driver.make_run_fn(geom, config, 14400)(state)
    assert bool(info.ok), f"blew up at step {int(info.blown_step)}"
    p = np.asarray(out_state.prog.p)
    assert np.isfinite(p).all() and 9e4 < p.mean() < 1.1e5


def test_adaptive_equals_unrolled():
    """The early-exit while_loop form reaches the fixed-sweep form's
    fixed point (identical up to XLA FMA-contraction rounding: the while
    body and the unrolled graph contract multiply-adds differently)."""
    import numpy as np

    from gcmiipy_tpu.physics.convection import convective_adjustment

    rng = np.random.default_rng(3)
    L, H, W = 9, 8, 16
    tt = 250.0 + 40.0 * rng.random((L, H, W))
    sig = np.linspace(0.95, 0.1, L).reshape(L, 1, 1)
    tp = 1e5 * sig
    dp = 1e5 * np.full((L, 1, 1), 1.0 / L)
    a = convective_adjustment(jnp.asarray(tt), jnp.asarray(tp),
                              jnp.asarray(dp), adaptive=True)
    b = convective_adjustment(jnp.asarray(tt), jnp.asarray(tp),
                              jnp.asarray(dp), adaptive=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=0, atol=1e-10)
    # and it genuinely adjusted something on this random unstable field
    assert np.max(np.abs(np.asarray(a) - tt)) > 1.0
