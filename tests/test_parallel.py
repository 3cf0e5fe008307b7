"""Multi-device correctness: GSPMD and explicit-halo shard_map paths must
reproduce the single-device core bit-tight on a virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcmiipy_tpu.dynamics import core25d
from gcmiipy_tpu.grid import geometry
from gcmiipy_tpu.parallel import gspmd, halo, mesh as mesh_mod, shard_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _initial(geom, seed=0):
    rng = np.random.default_rng(seed)
    L, H, W = geom.layers, geom.height, geom.width
    p = jnp.asarray(1.0e5 * (1 + 0.001 * rng.standard_normal((H, W))))
    u = jnp.asarray(0.5 * rng.standard_normal((L, H, W)))
    v = jnp.asarray(0.5 * rng.standard_normal((L, H, W)))
    from gcmiipy_tpu import constants
    tp = np.asarray(p)[None] * np.asarray(geom.sig) + float(geom.ptop)
    t = jnp.asarray((300.0 + 5 * rng.standard_normal((L, H, W)))
                    * (constants.P0 / tp) ** constants.kappa)
    q = jnp.asarray(1e-5 * (1 + 0.1 * rng.random((L, H, W))))
    return p, u, v, t, q


def test_mesh_shape_heuristic():
    assert mesh_mod.best_mesh_shape(8) == (2, 4)
    assert mesh_mod.best_mesh_shape(4) == (2, 2)
    assert mesh_mod.best_mesh_shape(6) == (2, 3)
    assert mesh_mod.best_mesh_shape(1) == (1, 1)
    assert mesh_mod.best_mesh_shape(7) == (1, 7)


def test_halo_exchange_matches_roll():
    # padded array slices must equal what a periodic roll would deliver
    mesh = mesh_mod.make_mesh(8, shape=(2, 4))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 16)))

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def body(xl):
        return halo.exchange_2d(xl, 2)

    padded = shard_map(body, mesh=mesh,
                       in_specs=(P("y", "x"),),
                       out_specs=P("y", "x"))(x)
    # shard (0,0) local block is rows 0:4, cols 0:4 -> padded 8x8
    pad00 = np.asarray(padded)[:8, :8]
    xg = np.asarray(x)
    # interior equals the block
    np.testing.assert_array_equal(pad00[2:6, 2:6], xg[0:4, 0:4])
    # top pad rows wrap to the bottom of the globe (periodic)
    np.testing.assert_array_equal(pad00[0:2, 2:6], xg[6:8, 0:4])
    # left pad cols wrap around the lon ring
    np.testing.assert_array_equal(pad00[2:6, 0:2], xg[0:4, 14:16])
    # corners came through the second exchange
    np.testing.assert_array_equal(pad00[0:2, 0:2], xg[6:8, 14:16])


def test_shard_step_matches_single_device():
    geom = geometry.gen_geometry(16, 32, 3, sig_func=geometry.manabe_sig)
    mesh = mesh_mod.make_mesh(8, shape=(2, 4))
    state = _initial(geom)
    dt = 300.0

    step_sharded = shard_step.make_shard_step(mesh, geom, dt,
                                              dtype=np.float64)
    step_single = jax.jit(lambda *s: core25d.matsuno_timestep(*s, dt, geom))

    from gcmiipy_tpu.model.state import PrognosticVars
    s_ref = state
    s_shd = tuple(shard_step.shard_prognostics(PrognosticVars(*state), mesh))
    for _ in range(5):
        s_ref = step_single(*s_ref)
        s_shd = step_sharded(*s_shd)
    for name, a, b in zip("puvtq", s_ref, s_shd):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-9,
                                   err_msg=f"field {name}")


def test_shard_step_uneven_mesh_1d():
    # a 1 x 8 mesh (lon-only decomposition)
    geom = geometry.gen_geometry(8, 32, 2, sig_func=geometry.manabe_sig)
    mesh = mesh_mod.make_mesh(8, shape=(1, 8))
    state = _initial(geom, seed=1)
    dt = 300.0
    step_sharded = shard_step.make_shard_step(mesh, geom, dt,
                                              dtype=np.float64)
    step_single = jax.jit(lambda *s: core25d.matsuno_timestep(*s, dt, geom))
    s_ref = step_single(*state)
    s_shd = step_sharded(*state)
    for a, b in zip(s_ref, s_shd):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-9)


def test_gspmd_matches_single_device():
    from gcmiipy_tpu.model import driver as driver_mod
    from gcmiipy_tpu.model.config import ModelConfig

    config = ModelConfig(height=16, width=32, layers=3, dtype="float64",
                         polar_filter="matmul", dt=300.0)
    geom = geometry.gen_geometry(16, 32, 3, sig_func=geometry.manabe_sig)
    mesh = mesh_mod.make_mesh(8, shape=(2, 4))

    state = driver_mod.gen_model_state(geom, config)
    run_single = driver_mod.make_run_fn(geom, config, 5)
    run_sharded = gspmd.make_sharded_run_fn(geom, config, 5, mesh)

    out_single, _ = run_single(state)
    state2 = driver_mod.gen_model_state(geom, config)
    out_sharded, _ = run_sharded(gspmd.shard_state(state2, mesh))

    for a, b in zip(out_single.prog, out_sharded.prog):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-10, atol=1e-10)


def test_shard_step_rejects_bad_grid():
    mesh = mesh_mod.make_mesh(8, shape=(2, 4))
    # height 4 on a 2-row mesh -> 2-row shards, below the halo width of 3
    geom = geometry.gen_geometry(4, 32, 2)
    with pytest.raises(ValueError):
        shard_step.make_shard_step(mesh, geom, 300.0)
    # height 9 does not divide the 2-row mesh
    geom2 = geometry.gen_geometry(9, 32, 2)
    with pytest.raises(ValueError):
        shard_step.make_shard_step(mesh, geom2, 300.0)


def test_shard_step_fused_matches_single_device():
    """Lat-ring mega-kernel shard path (interpret mode) vs the XLA core
    with the f64-exact DFT filter: same operator, roundoff agreement."""
    from jax.sharding import Mesh
    from gcmiipy_tpu.ops import polar_filter

    geom = geometry.gen_geometry(64, 128, 2, sig_func=geometry.manabe_sig)
    mesh = Mesh(np.array(jax.devices()[:8]), ("y",))
    dt = 300.0

    step_sharded = shard_step.make_shard_step_fused(
        mesh, geom, dt, dtype=np.float64, interpret=True)

    mats = polar_filter.build_dft_matrices(geom.width, dtype=np.float64)
    filt = lambda q, g: polar_filter.arakawa_1977_dft(
        q, g, mats, precision="highest")
    step_single = jax.jit(lambda *s: core25d.matsuno_timestep(
        *s, dt, geom, filter_fn=filt))

    state = _initial(geom, seed=11)
    s_ref, s_shd = state, state
    for _ in range(2):
        s_ref = step_single(*s_ref)
        s_shd = step_sharded(*s_shd)
    for name, a, b in zip("puvtq", s_ref, s_shd):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-9,
                                   err_msg=f"field {name}")


def test_scaling_harness_runs():
    """bench_scaling's measurement core runs every path at 1 and 2 devices
    and emits throughput + efficiency records (the artifact the driver
    captures on real chips; BASELINE.md scaling target)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import bench_scaling

    results = bench_scaling.run_scaling(
        16, 64, 2, steps=2, device_counts=[1, 2],
        paths=["gspmd", "fused", "shard"], dtype="float32")
    by_path = {}
    for r in results:
        assert "error" not in r, r
        by_path.setdefault(r["path"], []).append(r)
    for path, recs in by_path.items():
        assert [r["devices"] for r in recs] == [1, 2]
        assert all(r["points_per_sec"] > 0 for r in recs)
        assert recs[0]["efficiency_vs_first"] == 1.0


def test_shard_step_fused4_matches_single_device():
    """Whole-step (v4) lat-ring shard path: one ppermute round + one
    kernel per step, banded in-kernel filter — matches the single-device
    XLA core with the exact DFT filter at f64 roundoff."""
    from jax.sharding import Mesh
    from gcmiipy_tpu.ops import polar_filter

    geom = geometry.gen_geometry(64, 128, 2, sig_func=geometry.manabe_sig)
    mesh = Mesh(np.array(jax.devices()[:8]), ("y",))
    dt = 300.0

    step_sharded = shard_step.make_shard_step_fused4(
        mesh, geom, dt, dtype=np.float64, interpret=True)

    mats = polar_filter.build_dft_matrices(geom.width, dtype=np.float64)
    filt = lambda q, g: polar_filter.arakawa_1977_dft(
        q, g, mats, precision="highest")
    step_single = jax.jit(lambda *s: core25d.matsuno_timestep(
        *s, dt, geom, filter_fn=filt))

    state = _initial(geom, seed=21)
    s_ref, s_shd = state, state
    for _ in range(2):
        s_ref = step_single(*s_ref)
        s_shd = step_sharded(*s_shd)
    for name, a, b in zip("puvtq", s_ref, s_shd):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-9,
                                   err_msg=f"field {name}")


def test_shard_step_fused4_uneven_tile():
    """Shard rows not divisible by the default tile: tile_j reduction."""
    from jax.sharding import Mesh

    geom = geometry.gen_geometry(32, 128, 2, sig_func=geometry.manabe_sig)
    mesh = Mesh(np.array(jax.devices()[:4]), ("y",))  # 8 rows/shard
    step_sharded = shard_step.make_shard_step_fused4(
        mesh, geom, 300.0, dtype=np.float64, interpret=True)
    state = _initial(geom, seed=22)
    out = step_sharded(*state)
    step_single = jax.jit(lambda *s: core25d.matsuno_timestep(
        *s, 300.0, geom,
        filter_fn=lambda q, g: __import__
        ('gcmiipy_tpu.ops.polar_filter', fromlist=['x']).arakawa_1977(q, g)))
    # compare against the FFT-filter core loosely (filters differ at
    # roundoff only in f64: DFT matmul vs rFFT are the same operator)
    ref = step_single(*state)
    for name, a, b in zip("puvtq", ref, out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-9,
                                   err_msg=f"field {name}")


def test_mesh_run_model_guarded_checkpointed(tmp_path):
    """VERDICT #4: the lat-ring path as a production run path — a guarded,
    stats-on, checkpointed run_model(..., mesh=...) on 8 virtual devices
    matches the single-device run."""
    from jax.sharding import Mesh

    from gcmiipy_tpu.model.config import ModelConfig
    from gcmiipy_tpu.model.driver import run_model

    mesh = Mesh(np.array(jax.devices()[:8]), ("y",))
    cfg = ModelConfig(backend="mega4", dtype="float64", guard=True,
                      stats=True, checkpoint_dir=str(tmp_path),
                      checkpoint_every=2)
    out_m = run_model(64, 128, 2, 300.0, 4, config=cfg, mesh=mesh)

    cfg1 = ModelConfig(backend="xla", dtype="float64", guard=True,
                       stats=True)
    out_1 = run_model(64, 128, 2, 300.0, 4, config=cfg1)

    for name, a, b in zip("puvtq", out_1[:5], out_m[:5]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-9,
                                   err_msg=f"field {name}")
    # stats agree (energy reductions became psum-style collectives)
    np.testing.assert_allclose(np.asarray(out_m[7].total_energy),
                               np.asarray(out_1[7].total_energy),
                               rtol=1e-9)
    # checkpoints were written at steps 2 and 4
    import glob
    names = sorted(p.split("/")[-1] for p in glob.glob(str(tmp_path) + "/*"))
    assert names == ["step_0000000002", "step_0000000004"]


def test_mesh_run_model_xla_backend():
    """mesh + backend='xla': GSPMD path through the same run_model door."""
    from jax.sharding import Mesh

    from gcmiipy_tpu.model.config import ModelConfig
    from gcmiipy_tpu.model.driver import run_model

    mesh = Mesh(np.array(jax.devices()[:4]), ("y",))
    cfg = ModelConfig(backend="xla", dtype="float64", stats=False)
    out_m = run_model(32, 64, 2, 300.0, 3, config=cfg, mesh=mesh)
    out_1 = run_model(32, 64, 2, 300.0, 3, config=cfg)
    for name, a, b in zip("puvtq", out_1[:5], out_m[:5]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-10, atol=1e-10,
                                   err_msg=f"field {name}")


def test_shard_step_fused4_overlap():
    """overlap=True (interior kernel independent of the halo ppermutes +
    two edge-strip kernels) == the single-kernel lat-ring step == the
    single-device core."""
    from jax.sharding import Mesh

    geom = geometry.gen_geometry(96, 128, 2, sig_func=geometry.manabe_sig)
    mesh = Mesh(np.array(jax.devices()[:2]), ("y",))  # 48 rows/shard
    state = _initial(geom, seed=31)
    step_ov = shard_step.make_shard_step_fused4(
        mesh, geom, 300.0, dtype=np.float64, interpret=True, overlap=True)
    step_pl = shard_step.make_shard_step_fused4(
        mesh, geom, 300.0, dtype=np.float64, interpret=True)
    out_ov = step_ov(*state)
    out_pl = step_pl(*state)
    for name, a, b in zip("puvtq", out_pl, out_ov):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-12, atol=1e-12,
                                   err_msg=f"field {name}")


def test_shard_step_fused4_overlap_fallback_small_shard():
    """Shards too small for the interior/edge split fall back with a
    warning and still compute correctly."""
    import warnings as _w

    from jax.sharding import Mesh

    geom = geometry.gen_geometry(32, 128, 2, sig_func=geometry.manabe_sig)
    mesh = Mesh(np.array(jax.devices()[:2]), ("y",))  # 16 rows/shard
    state = _initial(geom, seed=32)
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        step_ov = shard_step.make_shard_step_fused4(
            mesh, geom, 300.0, dtype=np.float64, interpret=True,
            overlap=True, tile_j=16)
    assert any("overlap" in str(w.message) for w in caught)
    step_pl = shard_step.make_shard_step_fused4(
        mesh, geom, 300.0, dtype=np.float64, interpret=True, tile_j=16)
    out_ov = step_ov(*state)
    out_pl = step_pl(*state)
    for a, b in zip(out_pl, out_ov):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-12, atol=1e-12)


def test_shard_stream_ring_matches_single_device():
    """K-step streaming lat-ring path (one launch + one K*PHJ-deep
    ppermute round per K steps, recompute-on-halo in time) == the
    single-device XLA core with the exact DFT filter at f64 roundoff."""
    from jax.sharding import Mesh
    from gcmiipy_tpu.ops import polar_filter

    geom = geometry.gen_geometry(128, 128, 2, sig_func=geometry.manabe_sig)
    mesh = Mesh(np.array(jax.devices()[:8]), ("y",))
    dt = 300.0
    K = 2

    adv = shard_step.make_shard_stream_ring(
        mesh, geom, dt, steps_per_launch=K, dtype=np.float64,
        interpret=True)
    assert adv.chunk_steps == K

    mats = polar_filter.build_dft_matrices(geom.width, dtype=np.float64)
    filt = lambda q, g: polar_filter.arakawa_1977_dft(
        q, g, mats, precision="highest")
    step_single = jax.jit(lambda *s: core25d.matsuno_timestep(
        *s, dt, geom, filter_fn=filt))

    state = _initial(geom, seed=31)
    s_ref, s_shd = state, state
    for _ in range(2):          # 2 launches = 4 steps
        s_ref = step_single(*step_single(*s_ref))
        s_shd = adv(*s_shd)
    for name, a, b in zip("puvtq", s_ref, s_shd):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-9,
                                   err_msg=f"field {name}")


def test_shard_stream_ring_polar_wall_and_validation():
    from jax.sharding import Mesh

    geom = geometry.gen_geometry(128, 128, 2)
    mesh = Mesh(np.array(jax.devices()[:8]), ("y",))
    adv = shard_step.make_shard_stream_ring(
        mesh, geom, 100.0, steps_per_launch=2, dtype=np.float64,
        interpret=True)
    state = _initial(geom, seed=32)
    _, _, v_n, _, _ = adv(*state)
    np.testing.assert_allclose(np.asarray(v_n)[:, -1, :], 0.0, atol=1e-14)
    # halo depth exceeding the shard rows must raise, as must odd K
    with pytest.raises(ValueError, match="halo"):
        shard_step.make_shard_stream_ring(mesh, geom, 100.0,
                                          steps_per_launch=4,
                                          interpret=True)
    with pytest.raises(ValueError, match="even"):
        shard_step.make_shard_stream_ring(mesh, geom, 100.0,
                                          steps_per_launch=3,
                                          interpret=True)


def test_stream_ring_run_model():
    """mesh + backend='stream': the K-step streaming ring as a production
    run path — guarded, stats-on run_model matches the single-device
    stream run (itself pinned to the XLA core) at f64 roundoff."""
    from jax.sharding import Mesh

    from gcmiipy_tpu.model.config import ModelConfig
    from gcmiipy_tpu.model.driver import run_model

    mesh = Mesh(np.array(jax.devices()[:8]), ("y",))
    cfg = ModelConfig(backend="stream", stream_steps=2, dtype="float64",
                      guard=True, stats=True)
    out_m = run_model(128, 128, 2, 300.0, 5, config=cfg, mesh=mesh)
    out_1 = run_model(128, 128, 2, 300.0, 5, config=cfg)
    for name, a, b in zip("puvtq", out_1[:5], out_m[:5]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-9,
                                   err_msg=f"field {name}")
    np.testing.assert_allclose(np.asarray(out_m[7].total_energy),
                               np.asarray(out_1[7].total_energy),
                               rtol=1e-9)


def test_stream_ring_run_model_physics():
    """mesh + stream + physics cadence: extras run between ring launches
    and match the single-device stream path exactly."""
    from jax.sharding import Mesh

    from gcmiipy_tpu.model.config import ModelConfig
    from gcmiipy_tpu.model.driver import run_model

    mesh = Mesh(np.array(jax.devices()[:4]), ("y",))
    cfg = ModelConfig(backend="stream", stream_steps=2, physics=True,
                      physics_every=2, drag_tau=86400.0,
                      dtype="float64", stats=False)
    out_m = run_model(128, 128, 2, 300.0, 4, config=cfg, mesh=mesh)
    out_1 = run_model(128, 128, 2, 300.0, 4, config=cfg)
    for name, a, b in zip("puvtq", out_1[:5], out_m[:5]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-9,
                                   err_msg=f"field {name}")
    np.testing.assert_allclose(np.asarray(out_m[5].gt),
                               np.asarray(out_1[5].gt), rtol=1e-9)


def test_stream_ring_cadence_survives_halo_clamp():
    """When the ring-halo bound clamps the launch size, cadence points
    must still land on chunk boundaries: physics_every=10 on a mesh whose
    shard rows cap K at 4 must clamp K to 2 (the largest even divisor of
    the cadence), not 4 — and match the single-device run exactly."""
    from jax.sharding import Mesh

    from gcmiipy_tpu.model.config import ModelConfig
    from gcmiipy_tpu.model.driver import run_model

    # 8 shards x 32 rows: k_cap = (32 // 8) - 0 = 4; physics_every = 10
    mesh = Mesh(np.array(jax.devices()[:8]), ("y",))
    cfg = ModelConfig(backend="stream", stream_steps=10, physics=True,
                      physics_every=10, drag_tau=86400.0,
                      dtype="float64", stats=False)
    out_m = run_model(256, 128, 2, 300.0, 10, config=cfg, mesh=mesh)
    out_1 = run_model(256, 128, 2, 300.0, 10, config=cfg)
    for name, a, b in zip("puvtq", out_1[:5], out_m[:5]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-9,
                                   err_msg=f"field {name}")
    np.testing.assert_allclose(np.asarray(out_m[5].gt),
                               np.asarray(out_1[5].gt), rtol=1e-9)
