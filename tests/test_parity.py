"""Parity: the JAX 2.5D core matches the NumPy float64 oracle bit-tight.

This is the BASELINE.md correctness target ("prognostic fields allclose to
the NumPy reference after N steps").  The oracle is a pint-free NumPy
transcription of reference ``dynamics.py`` (gcmiipy_tpu/oracle/numpy_ref.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from gcmiipy_tpu.dynamics import core25d
from gcmiipy_tpu.grid import geometry
from gcmiipy_tpu.oracle import numpy_ref


def _initial(geom, seed=0):
    rng = np.random.default_rng(seed)
    L, H, W = geom.layers, geom.height, geom.width
    p = 1.0e5 * (1 + 0.001 * rng.standard_normal((H, W)))
    u = 0.5 * rng.standard_normal((L, H, W))
    v = 0.5 * rng.standard_normal((L, H, W))
    tp = p * geom.sig + geom.ptop
    tt = 300.0 + 5 * rng.standard_normal((L, H, W))
    from gcmiipy_tpu import constants
    t = tt * (constants.P0 / tp) ** constants.kappa
    q = 1e-5 * (1 + 0.1 * rng.random((L, H, W)))
    return p, u, v, t, q


def _run_pair(geom, steps, dt=900.0):
    p, u, v, t, q = _initial(geom)
    s_np = (p.copy(), u.copy(), v.copy(), t.copy(), q.copy())
    for _ in range(steps):
        s_np = numpy_ref.matsuno_timestep_np(*s_np, dt, geom)

    step = jax.jit(lambda *s: core25d.matsuno_timestep(*s, dt, geom))
    s_jx = tuple(jnp.asarray(x) for x in (p, u, v, t, q))
    for _ in range(steps):
        s_jx = step(*s_jx)
    return s_np, tuple(np.asarray(x) for x in s_jx)


def test_parity_25d_spherical_10_steps():
    geom = geometry.gen_geometry(8, 8, 3, sig_func=geometry.manabe_sig)
    s_np, s_jx = _run_pair(geom, steps=10)
    names = "puvtq"
    for name, a, b in zip(names, s_np, s_jx):
        np.testing.assert_allclose(b, a, rtol=1e-10, atol=1e-10,
                                   err_msg=f"field {name}")


def test_parity_25d_gcm_grid_5_steps():
    # the GCM-II native grid: 24 lat x 36 lon x 9 layers
    # (reference no_limits_2_5d.py:123-126)
    geom = geometry.gen_geometry(24, 36, 9, sig_func=geometry.manabe_sig)
    s_np, s_jx = _run_pair(geom, steps=5)
    for a, b in zip(s_np, s_jx):
        np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-9)


def test_parity_square_geometry():
    geom = geometry.gen_square_geometry(8, 16, 3, dx=100e3, dy=100e3)
    s_np, s_jx = _run_pair(geom, steps=10, dt=60.0)
    for a, b in zip(s_np, s_jx):
        np.testing.assert_allclose(b, a, rtol=1e-10, atol=1e-10)


def test_parity_with_topography():
    from gcmiipy_tpu.grid import topography
    geom = geometry.gen_geometry(24, 36, 9, sig_func=geometry.manabe_sig,
                                 heightmap=topography.calc_topography())
    s_np, s_jx = _run_pair(geom, steps=3)
    for a, b in zip(s_np, s_jx):
        np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-9)


def test_parity_25d_historical_sige_5_steps():
    """The TRUE GCM-II grid: 24x36x9 on the historical SIGE ladder
    (reference geometry.py:45) with DT=900 s and PTOP=10 mb
    (port_BAjal.py:47,58), vs the NumPy oracle."""
    geom = geometry.gen_geometry(24, 36, 9, sige_table=geometry.GISS_SIGE,
                                 ptop=1000.0)
    s_np, s_jx = _run_pair(geom, steps=5, dt=900.0)
    for name, a, b in zip("puvtq", s_np, s_jx):
        np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-9,
                                   err_msg=f"field {name}")


def test_historical_sige_blowup_parity():
    """Long-run semantics parity on the TRUE GCM-II grid, instability
    included: without the original model's SDRAG/SHAP1D dissipation (stubs
    in the reference, port.py:539-599) the 24x36x9 DT=900 quiescent run is
    unstable — and the JAX core's guarded scan flags the blow-up at the
    SAME step as the NumPy oracle (both trip the 1150 mb pressure scream
    at step 106)."""
    from gcmiipy_tpu.model import driver
    from gcmiipy_tpu.model.config import ModelConfig

    config = ModelConfig(dt=900.0, dtype="float64", guard=True)
    geom = geometry.gen_geometry(24, 36, 9, sige_table=geometry.GISS_SIGE,
                                 ptop=1000.0)
    state = driver.gen_model_state(geom, config)
    run = driver.make_run_fn(geom, config, 115)
    out_state, stats, info = run(state)
    assert not bool(info.ok)
    jax_blown = int(info.blown_step)

    # oracle with the identical IC and guard criterion
    prog0 = driver.gen_model_state(geom, config).prog
    s = tuple(np.asarray(x, np.float64) for x in prog0)
    oracle_blown = None
    for i in range(115):
        s = numpy_ref.matsuno_timestep_np(*s, 900.0, geom)
        if (np.isnan(s[0]).any() or (s[0] > config.guard_p_max).any()
                or (s[0] <= config.guard_p_min).any()):
            oracle_blown = i
            break
    assert oracle_blown is not None
    assert jax_blown == oracle_blown == 106
    # the guarded state froze at the last good step: still inside bounds
    p = np.asarray(out_state.prog.p)
    assert np.isfinite(p).all() and p.max() <= config.guard_p_max
