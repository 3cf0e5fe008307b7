"""Checkpoint/restore roundtrip and run-resumption equivalence."""

import jax.numpy as jnp
import numpy as np
import pytest

from gcmiipy_tpu.grid import geometry
from gcmiipy_tpu.model import checkpoint, driver, observability
from gcmiipy_tpu.model.config import ModelConfig


def _state(dtype="float64"):
    config = ModelConfig(height=4, width=4, layers=2, dtype=dtype)
    geom = geometry.gen_geometry(4, 4, 2, sig_func=geometry.manabe_sig)
    geom = geom.astype(np.dtype(dtype))
    return geom, config, driver.gen_model_state(geom, config)


@pytest.mark.parametrize("use_orbax", [False, True])
def test_checkpoint_roundtrip(tmp_path, use_orbax):
    geom, config, state = _state()
    checkpoint.save_checkpoint(str(tmp_path), state, 7, use_orbax=use_orbax)
    restored, step = checkpoint.restore_checkpoint(str(tmp_path))
    assert step == 7
    for a, b in zip(state.prog, restored.prog):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(state.ground, restored.ground):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(state.utc),
                                  np.asarray(restored.utc))


def test_latest_step_selection(tmp_path):
    geom, config, state = _state()
    for s in (3, 12, 9):
        checkpoint.save_checkpoint(str(tmp_path), state, s, use_orbax=False)
    assert checkpoint.latest_step(str(tmp_path)) == 12
    _, step = checkpoint.restore_checkpoint(str(tmp_path))
    assert step == 12


def test_resume_equals_straight_run(tmp_path):
    # run 6 steps == run 3, checkpoint, restore, run 3 more
    geom, config, state = _state()
    run6 = driver.make_run_fn(geom, config, 6)
    run3 = driver.make_run_fn(geom, config, 3)

    full, _ = run6(state)

    geom2, config2, state2 = _state()
    half, _ = run3(state2)
    checkpoint.save_checkpoint(str(tmp_path), half, 3, use_orbax=False)
    restored, _ = checkpoint.restore_checkpoint(str(tmp_path))
    resumed, _ = run3(restored)

    for a, b in zip(full.prog, resumed.prog):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_restore_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        checkpoint.restore_checkpoint(str(tmp_path / "nope"))


def test_metrics_logger(tmp_path):
    path = tmp_path / "metrics.jsonl"
    log = observability.MetricsLogger(str(path))
    log.log(0, ke=1.5, u_max=2.0)
    log.log(1, ke=1.6, u_max=2.1)
    log.close()
    import json
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert lines[0]["step"] == 0 and lines[1]["ke"] == 1.6
    assert log.history[0]["u_max"] == 2.0


def test_checkpoint_cadence_in_run_model(tmp_path):
    """checkpoint_every=3 over 7 steps leaves step-3/6/7 checkpoints and
    matches an unchunked run bit-for-bit."""
    config = ModelConfig(dtype="float64",
                         checkpoint_dir=str(tmp_path / "ck"),
                         checkpoint_every=3)
    out = driver.run_model(4, 4, 2, 900.0, 7, config=config)
    steps = sorted(
        int(n[5:].removesuffix(".npz"))
        for n in (tmp_path / "ck").iterdir()
        for n in [n.name] if n.startswith("step_"))
    assert steps == [3, 6, 7]
    restored, step = checkpoint.restore_checkpoint(str(tmp_path / "ck"))
    assert step == 7
    plain = driver.run_model(4, 4, 2, 900.0, 7,
                             config=ModelConfig(dtype="float64"))
    np.testing.assert_array_equal(np.asarray(out[0]),
                                  np.asarray(restored.prog.p))
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(plain[0]))
    assert out[7] is not None and len(out[7].ke) == 7  # stats stitched


def test_guard_freezes_on_nan():
    """A seeded-NaN run flags the blow-up and freezes instead of scanning
    garbage to the end (reference no_limits_2_5d.py:213)."""
    import warnings

    config = ModelConfig(height=4, width=4, layers=2, dtype="float64",
                         guard=True)
    geom = geometry.gen_geometry(4, 4, 2, sig_func=geometry.manabe_sig)
    state = driver.gen_model_state(geom, config)
    # poison u so step 0 already produces NaN
    bad_u = state.prog.u.at[0, 0, 0].set(jnp.nan)
    state = state._replace(prog=state.prog._replace(u=bad_u))
    run = driver.make_run_fn(geom, config, 5)
    out_state, stats, info = run(state)
    assert not bool(info.ok)
    assert int(info.blown_step) == 0
    # frozen at the last good state: p stayed finite
    assert np.isfinite(np.asarray(out_state.prog.p)).all()


def test_guard_pressure_bounds():
    """The GCM-II pressure scream (port.py:295-310): p above guard_p_max
    trips the guard even without NaNs."""
    config = ModelConfig(height=4, width=4, layers=2, dtype="float64",
                         guard=True, guard_p_max=50.0)  # absurdly tight
    geom = geometry.gen_geometry(4, 4, 2, sig_func=geometry.manabe_sig)
    state = driver.gen_model_state(geom, config)
    run = driver.make_run_fn(geom, config, 3)
    _, _, info = run(state)
    assert not bool(info.ok) and int(info.blown_step) == 0


def test_guard_clean_run_ok():
    config = ModelConfig(height=4, width=4, layers=2, dtype="float64",
                         guard=True)
    geom = geometry.gen_geometry(4, 4, 2, sig_func=geometry.manabe_sig)
    state = driver.gen_model_state(geom, config)
    out_state, stats, info = driver.make_run_fn(geom, config, 4)(state)
    assert bool(info.ok) and int(info.blown_step) == -1
    # guarded run advances identically to the unguarded one
    plain, _ = driver.make_run_fn(
        geom, ModelConfig(height=4, width=4, layers=2, dtype="float64"),
        4)(driver.gen_model_state(geom, config))
    np.testing.assert_array_equal(np.asarray(out_state.prog.p),
                                  np.asarray(plain.prog.p))


def test_run_model_metrics_path(tmp_path):
    import json

    path = tmp_path / "m.jsonl"
    config = ModelConfig(dtype="float64", metrics_path=str(path))
    driver.run_model(4, 4, 2, 900.0, 3, config=config)
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert [l["step"] for l in lines] == [0, 1, 2]
    assert all(np.isfinite(l["total_energy"]) for l in lines)


def test_guard_temperature_bounds():
    """CHECKT analog (stub in the reference, port.py:593-599): potential
    temperature outside [guard_t_min, guard_t_max] trips the guard."""
    config = ModelConfig(height=4, width=4, layers=2, dtype="float64",
                         guard=True, guard_t_max=200.0)  # IC is ~360 K pot.T
    geom = geometry.gen_geometry(4, 4, 2, sig_func=geometry.manabe_sig)
    state = driver.gen_model_state(geom, config)
    _, _, info = driver.make_run_fn(geom, config, 3)(state)
    assert not bool(info.ok) and int(info.blown_step) == 0

    # same run with sane bounds stays clean
    config2 = ModelConfig(height=4, width=4, layers=2, dtype="float64",
                          guard=True, guard_t_max=1e4, guard_t_min=1.0)
    state2 = driver.gen_model_state(geom, config2)
    _, _, info2 = driver.make_run_fn(geom, config2, 3)(state2)
    assert bool(info2.ok) and int(info2.blown_step) == -1


def test_stream_resume_preserves_cadence(tmp_path):
    """Checkpoint/restore across stream chunks preserves the global step
    counter the physics/Shapiro cadences key off: run 8 steps straight ==
    run 4, checkpoint, restore, run 4 — with physics_every=4 and
    shapiro_every=8 active (the second half's cadence points only fire if
    the restored counter is right)."""
    from gcmiipy_tpu.grid import geometry as geo
    from gcmiipy_tpu.model.config import ModelConfig

    cfg = ModelConfig(backend="stream", stream_steps=4, dtype="float64",
                      physics=True, physics_every=4, shapiro_every=8,
                      drag_tau=86400.0, stats=False, dt=300.0)
    geom = geo.gen_geometry(16, 128, 3,
                            sig_func=geo.manabe_sig).astype(np.float64)
    state = driver.gen_model_state(geom, cfg)
    run8 = driver.make_run_fn(geom, cfg, 8)
    run4 = driver.make_run_fn(geom, cfg, 4)

    full, _ = run8(driver.gen_model_state(geom, cfg))
    half, _ = run4(state)
    checkpoint.save_checkpoint(str(tmp_path), half, 4, use_orbax=False)
    restored, _ = checkpoint.restore_checkpoint(str(tmp_path))
    assert int(restored.step) == 4
    resumed, _ = run4(restored)

    for name, a, b in zip("puvtq", full.prog, resumed.prog):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-12, atol=1e-12,
                                   err_msg=f"field {name}")
    np.testing.assert_allclose(np.asarray(resumed.ground.gt),
                               np.asarray(full.ground.gt), rtol=1e-12)


def test_stream_misaligned_resume_keeps_cadence(tmp_path):
    """Resuming a stream run from a non-chunk-aligned step (round-4
    advisor: e.g. a 6-step run leaves step 6 with K=4) must keep applying
    the cadenced extras.  With ``start_step`` passed, a per-step alignment
    head makes the cadence exact (== a straight 12-step run); without it,
    the windowed chunk-boundary checks still fire extras (delayed to the
    next boundary) instead of silently dropping them forever."""
    from gcmiipy_tpu.grid import geometry as geo

    cfg = ModelConfig(backend="stream", stream_steps=4, dtype="float64",
                      physics=True, physics_every=4, drag_tau=86400.0,
                      stats=False, dt=300.0)
    geom = geo.gen_geometry(16, 128, 3,
                            sig_func=geo.manabe_sig).astype(np.float64)

    full12, _ = driver.make_run_fn(geom, cfg, 12)(
        driver.gen_model_state(geom, cfg))
    part6, _ = driver.make_run_fn(geom, cfg, 6)(
        driver.gen_model_state(geom, cfg))
    assert int(part6.step) == 6  # 6 % 4 != 0: chunk-misaligned

    checkpoint.save_checkpoint(str(tmp_path), part6, 6, use_orbax=False)
    restored, step = checkpoint.restore_checkpoint(str(tmp_path))
    assert step == 6

    # exact resume: start_step triggers the 2-step per-step head, so the
    # remaining cadence points (steps 8 and 12) land exactly
    run_aligned = driver.make_run_fn(geom, cfg, 6, start_step=6)
    assert getattr(run_aligned, "head_steps", 0) == 2
    resumed, _ = run_aligned(restored)
    assert int(resumed.step) == 12
    for name, a, b in zip("puvtq", full12.prog, resumed.prog):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-9,
                                   err_msg=f"field {name}")
    np.testing.assert_allclose(np.asarray(resumed.ground.gt),
                               np.asarray(full12.ground.gt), rtol=1e-9)

    # windowed fallback: even without start_step the extras keep firing
    # (ground temperature must keep moving; pre-fix it froze forever)
    restored2, _ = checkpoint.restore_checkpoint(str(tmp_path))
    unaligned, _ = driver.make_run_fn(geom, cfg, 6)(restored2)
    assert not np.allclose(np.asarray(unaligned.ground.gt),
                           np.asarray(part6.ground.gt), rtol=0, atol=1e-12)
