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
