"""CLI entry point (python -m gcmiipy_tpu) — the framework-shaped analog of
the reference's hard-coded main() bodies (no_limits_2_5d.py:256-268)."""

import json
import os

import numpy as np

from gcmiipy_tpu.__main__ import main


def test_cli_run_smoke(tmp_path, capsys):
    metrics = tmp_path / "m.jsonl"
    rc = main(["run", "--height", "8", "--width", "16", "--layers", "3",
               "--dt", "900", "--steps", "3", "--guard",
               "--metrics", str(metrics)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "finite: True" in out
    lines = [json.loads(ln) for ln in metrics.read_text().splitlines()]
    assert len(lines) == 3 and np.isfinite(lines[-1]["total_energy"])


def test_cli_run_giss_sige_and_plots(tmp_path, capsys):
    plots = tmp_path / "plots"
    rc = main(["run", "--height", "24", "--width", "36", "--layers", "9",
               "--giss-sige", "--dt", "900", "--steps", "2",
               "--plot-dir", str(plots)])
    assert rc == 0
    assert "finite: True" in capsys.readouterr().out
    names = sorted(os.listdir(plots))
    assert names == ["energy.png", "final_p.png", "final_u.png",
                     "final_v.png"]


def test_config_giss_sige_geometry():
    """run_model with giss_sige must integrate on the historical ladder
    (reference geometry.py:45, PTOP=10 mb port_BAjal.py:58)."""
    from gcmiipy_tpu.grid import geometry
    from gcmiipy_tpu.model.config import ModelConfig
    from gcmiipy_tpu.model.driver import run_model

    cfg = ModelConfig(giss_sige=True, stats=False)
    p, u, v, t, q, ground, geom, stats = run_model(24, 36, 9, 900.0, 2,
                                                   config=cfg)
    np.testing.assert_allclose(np.asarray(geom.sige).ravel(),
                               geometry.GISS_SIGE)
    assert float(geom.ptop) == 1000.0
    assert np.isfinite(np.asarray(p)).all()


def test_cli_blown_run_exit_code(tmp_path, capsys):
    """A guard-tripped run must exit nonzero (the warning alone is easy to
    miss in scripts/CI)."""
    rc = main(["run", "--height", "8", "--width", "16", "--layers", "3",
               "--dt", "900", "--steps", "3", "--guard",
               "--guard-t-max", "200"])  # IC potential T ~ 360 K: trips
    assert rc == 3


def test_cli_metrics_requires_stats(capsys):
    rc = main(["run", "--height", "8", "--width", "16", "--layers", "3",
               "--steps", "1", "--metrics", "/tmp/x.jsonl", "--no-stats"])
    assert rc == 2
