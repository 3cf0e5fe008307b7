"""Streaming multi-step kernel (v5) parity — interpret mode on CPU.

The streaming kernel runs K whole Matsuno steps per launch with manual
double-buffered DMA over a packed ping-pong state buffer
(:mod:`gcmiipy_tpu.ops.pallas_stream`).  Its compute body is the shared
``matsuno_block_body`` the v4 kernel uses, so the things to verify here are
the DMA choreography: block/halo wrap addressing, the buffer ping-pong
across steps, the launch chunking, and the polar wall.  Compiled-path
parity on hardware is enforced by ``scripts/tpu_parity.py``.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gcmiipy_tpu.dynamics import core25d
from gcmiipy_tpu.grid import geometry
from gcmiipy_tpu.ops import pallas_stream as pstream


def _initial(geom, seed=0):
    rng = np.random.default_rng(seed)
    L, H, W = geom.layers, geom.height, geom.width
    p = jnp.asarray(1e5 * (1 + 1e-3 * rng.standard_normal((H, W))))
    u = jnp.asarray(0.5 * rng.standard_normal((L, H, W)))
    v = jnp.asarray(0.5 * rng.standard_normal((L, H, W)))
    from gcmiipy_tpu import constants
    tp = np.asarray(p)[None] * np.asarray(geom.sig) + float(geom.ptop)
    t = jnp.asarray((300 + 5 * rng.standard_normal((L, H, W)))
                    * (constants.P0 / tp) ** constants.kappa)
    q = jnp.asarray(1e-5 * (1 + 0.1 * rng.random((L, H, W))))
    return p, u, v, t, q


def _ref_steps(state, n, dt, geom):
    for _ in range(n):
        state = core25d.matsuno_timestep(*state, dt, geom)
    return state


@pytest.mark.parametrize("tile_j,k", [(8, 2), (8, 4)])
def test_stream_matches_core_f64(tile_j, k):
    """K steps of the streaming kernel == K XLA Matsuno steps (f64)."""
    geom = geometry.gen_geometry(16, 128, 3, sig_func=geometry.manabe_sig)
    state = _initial(geom)
    ref = _ref_steps(state, k, 300.0, geom)
    adv = pstream.make_stream_matsuno(geom, 300.0, steps_per_launch=k,
                                      dtype=jnp.float64, tile_j=tile_j,
                                      interpret=True)
    out = adv(*state, k)
    for name, a, b in zip("puvtq", ref, out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-11, atol=1e-11,
                                   err_msg=f"field {name}")


def test_stream_multi_launch_scan():
    """Two launches of K=2 through the scan == 4 reference steps (the
    ping-pong buffer and halo wrap must survive the launch boundary)."""
    geom = geometry.gen_geometry(16, 128, 3, sig_func=geometry.manabe_sig)
    state = _initial(geom, seed=1)
    ref = _ref_steps(state, 4, 300.0, geom)
    adv = pstream.make_stream_matsuno(geom, 300.0, steps_per_launch=2,
                                      dtype=jnp.float64, tile_j=8,
                                      interpret=True)
    out = adv(*state, 4)
    for name, a, b in zip("puvtq", ref, out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-11, atol=1e-11,
                                   err_msg=f"field {name}")


def test_stream_topography_coriolis():
    hm = np.zeros((16, 128))
    hm[4:8, 10:40] = 1500.0
    geom = geometry.gen_geometry(16, 128, 3, sig_func=geometry.manabe_sig,
                                 heightmap=hm)
    state = _initial(geom, seed=2)
    ref = state
    for _ in range(2):
        ref = core25d.matsuno_timestep(*ref, 300.0, geom, coriolis=True)
    adv = pstream.make_stream_matsuno(geom, 300.0, steps_per_launch=2,
                                      dtype=jnp.float64, tile_j=8,
                                      coriolis=True, interpret=True)
    out = adv(*state, 2)
    for name, a, b in zip("puvtq", ref, out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-11, atol=1e-11,
                                   err_msg=f"field {name}")


def test_stream_polar_wall():
    geom = geometry.gen_geometry(16, 128, 2)
    state = _initial(geom, seed=3)
    adv = pstream.make_stream_matsuno(geom, 100.0, steps_per_launch=2,
                                      dtype=jnp.float64, tile_j=8,
                                      interpret=True)
    _, _, v_n, _, _ = adv(*state, 2)
    np.testing.assert_allclose(np.asarray(v_n)[:, -1, :], 0.0, atol=1e-14)


def test_stream_pack_roundtrip():
    geom = geometry.gen_geometry(16, 128, 3)
    state = _initial(geom, seed=4)
    packed = pstream.pack_state(*state)
    assert packed.shape == (pstream.n_planes(3), 16, 128)
    out = pstream.unpack_state(packed, 3)
    for a, b in zip(state, out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stream_rejects_odd_steps():
    geom = geometry.gen_geometry(16, 128, 3)
    with pytest.raises(ValueError, match="even"):
        pstream.make_stream_kernel(geom, 300.0, steps=3, interpret=True)


def test_driver_stream_backend_matches_xla():
    """run_model(backend='stream') == run_model(backend='xla') at f64,
    including a remainder that does not divide stream_steps (7 = 1 chunk
    of 6 + 1 odd tail step through the mega4 path)."""
    from gcmiipy_tpu.model.config import ModelConfig
    from gcmiipy_tpu.model.driver import run_model

    kw = dict(dtype="float64", stats=True)
    cfg_s = ModelConfig(backend="stream", stream_steps=20, **kw)
    cfg_x = ModelConfig(backend="xla", **kw)
    out_s = run_model(16, 128, 3, 300.0, 7, config=cfg_s)
    out_x = run_model(16, 128, 3, 300.0, 7, config=cfg_x)
    for name, a, b in zip("puvtq", out_x[:5], out_s[:5]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-9,
                                   err_msg=f"field {name}")
    # stats: 1 per chunk + 1 for the tail = 2 entries
    assert len(np.asarray(out_s[7].total_energy)) == 2


def test_driver_stream_guard_healthy():
    from gcmiipy_tpu.model.config import ModelConfig
    from gcmiipy_tpu.model.driver import gen_model_state, make_run_fn
    from gcmiipy_tpu.grid import geometry as geo

    cfg = ModelConfig(backend="stream", stream_steps=4, dtype="float64",
                      guard=True, stats=False, dt=300.0)
    geom = geo.gen_geometry(16, 128, 3,
                            sig_func=geo.manabe_sig).astype(np.float64)
    state = gen_model_state(geom, cfg)
    run = make_run_fn(geom, cfg, 8)
    state, stats, guard = run(state)
    assert bool(guard.ok)
    assert int(state.step) == 8


def test_driver_stream_rejects_physics():
    from gcmiipy_tpu.model.config import ModelConfig
    from gcmiipy_tpu.model.driver import make_run_fn
    from gcmiipy_tpu.grid import geometry as geo

    cfg = ModelConfig(backend="stream", physics=True, dt=300.0)
    geom = geo.gen_geometry(16, 128, 3)
    with pytest.raises(ValueError, match="pure dynamics"):
        make_run_fn(geom, cfg, 8)


def test_stream_pipeline_bitwise_matches_plain():
    """The pair-interleaved (pipeline=True) block loop is BITWISE equal to
    the plain loop: each block's stage graph is unchanged, only the
    cross-block statement order differs (pallas_stream.compute_pair)."""
    geom = geometry.gen_geometry(32, 128, 3, sig_func=geometry.manabe_sig)
    state = _initial(geom)
    plain = pstream.make_stream_matsuno(geom, 300.0, steps_per_launch=2,
                                        dtype=jnp.float64, tile_j=8,
                                        interpret=True)
    piped = pstream.make_stream_matsuno(geom, 300.0, steps_per_launch=2,
                                        dtype=jnp.float64, tile_j=8,
                                        interpret=True, pipeline=True)
    a = plain(*state, 2)
    b = piped(*state, 2)
    for name, x, y in zip("puvtq", a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=f"field {name}")


def test_stream_pipeline_odd_block_count_falls_back():
    """An odd block count cannot pair: warn + unpipelined results."""
    geom = geometry.gen_geometry(24, 128, 3, sig_func=geometry.manabe_sig)
    state = _initial(geom)
    with pytest.warns(UserWarning, match="pipeline"):
        piped = pstream.make_stream_matsuno(geom, 300.0, steps_per_launch=2,
                                            dtype=jnp.float64, tile_j=8,
                                            interpret=True, pipeline=True)
    ref = _ref_steps(state, 2, 300.0, geom)
    out = piped(*state, 2)
    for name, x, y in zip("puvtq", ref, out):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=1e-11, atol=1e-11,
                                   err_msg=f"field {name}")
