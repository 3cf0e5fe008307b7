"""Ensemble DP axis, plotting utilities, and the long-run flagship config."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcmiipy_tpu.grid import geometry
from gcmiipy_tpu.model import driver
from gcmiipy_tpu.model.config import ModelConfig

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_ensemble_members_match_single_runs():
    """A 4-member ensemble sharded over a 4-device 'e' mesh reproduces each
    member's independent single-model run exactly."""
    from gcmiipy_tpu.parallel import ensemble

    config = ModelConfig(height=8, width=8, layers=3, dt=900.0,
                         dtype="float64")
    geom = geometry.gen_geometry(8, 8, 3, sig_func=geometry.manabe_sig)

    # 4 members with different v seeds
    members = []
    base = driver.gen_model_state(geom, config)
    for k in range(4):
        v = base.prog.v.at[0, 0, 0].set(0.05 * (k + 1))
        members.append(base._replace(prog=base.prog._replace(v=v)))

    mesh = ensemble.make_ensemble_mesh(4)
    stacked = jax.device_put(ensemble.stack_states(members),
                             ensemble.ensemble_shardings(mesh))
    run_e = ensemble.make_ensemble_run_fn(geom, config, 3, mesh)
    out, stats = run_e(stacked)
    assert out.prog.p.shape == (4, 8, 8)
    assert np.asarray(stats.total_energy).shape == (4, 3)

    run_1 = driver.make_run_fn(geom, config, 3)
    for k in range(4):
        v = base.prog.v.at[0, 0, 0].set(0.05 * (k + 1))
        member = base._replace(prog=base.prog._replace(v=v))
        # run_1 donates its argument: give each member fresh buffers
        single, _ = run_1(jax.tree.map(lambda x: x.copy(), member))
        for name, a, b in zip("puvtq", single.prog, out.prog):
            np.testing.assert_allclose(np.asarray(b)[k], np.asarray(a),
                                       rtol=1e-12, atol=1e-12,
                                       err_msg=f"member {k} field {name}")


def test_field_and_energy_plots(tmp_path):
    from gcmiipy_tpu.utils import plotting

    config = ModelConfig(dtype="float64")
    out = driver.run_model(8, 8, 3, 900.0, 3, config=config)
    p, stats = out[0], out[7]
    f1 = plotting.save_field_plot(p, str(tmp_path / "p.png"), title="p")
    f2 = plotting.save_energy_plot(stats, str(tmp_path / "energy.png"))
    assert os.path.getsize(f1) > 1000 and os.path.getsize(f2) > 1000


def test_plot_callback_via_run_model(tmp_path):
    from gcmiipy_tpu.utils import plotting

    cb = plotting.make_field_plot_callback(str(tmp_path), every=2)
    driver.run_model(8, 8, 3, 900.0, 4, callback=cb,
                     config=ModelConfig(dtype="float64", stats=False))
    pngs = sorted(tmp_path.glob("*.png"))
    assert [p.name for p in pngs] == ["step_000000_p.png",
                                      "step_000002_p.png"]


def test_longrun_flagship_dynamics_14400():
    """The reference main() run (8x8x3, dt=1800 s, 14400 steps,
    no_limits_2_5d.py:263): bounded energy, no NaNs, guard clean."""
    from scripts import longrun_flagship

    rec = longrun_flagship.run_case(physics=False, steps=14400,
                                    dtype="float64")
    assert rec["ok"] and rec["p_finite"]
    assert rec["energy_max_rel_drift"] < 1e-5


def test_longrun_flagship_physics_horizon():
    """Physics-on long run survives >= 5000 steps; the eventual pressure
    scream (~step 6308: grey heating of the isothermal 360 K IC with no
    convective adjustment) is guarded, finite, and recorded."""
    from scripts import longrun_flagship

    rec = longrun_flagship.run_case(physics=True, steps=8000,
                                    dtype="float64")
    assert rec["p_finite"]
    assert rec["ok"] or rec["blown_step"] >= 5000
