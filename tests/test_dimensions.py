"""End-to-end dimensional audit of the discretization (pint-twin).

The reference runs every operation through pint units (reference
``constants.py:5``; unit-dimension tests ``test_primitive_1d.py:84-175``).
Here the same audit runs test-side (SURVEY.md section 5.2): the NumPy
oracle executes UNCHANGED on dimension-tagged arrays
(:mod:`gcmiipy_tpu.utils.dimensions`), so any dimensionally inconsistent
term anywhere in the Matsuno step raises ``DimensionError``.
"""

import numpy as np
import pytest

from gcmiipy_tpu import constants
from gcmiipy_tpu.grid import geometry
from gcmiipy_tpu.oracle import numpy_ref
from gcmiipy_tpu.utils import dimensions as dm
from gcmiipy_tpu.utils.dimensions import (
    DIMENSIONLESS, K, KG_PER_M3, M, M_PER_S, M_PER_S2, PA, J_PER_KG_K, Q,
    DimensionError)


def _tagged_geom(geom):
    """Wrap the Geom's dimensional arrays (lengths in m, pressures in Pa)."""
    import dataclasses
    return dataclasses.replace(
        geom,
        dx_j=Q(np.asarray(geom.dx_j, np.float64), M),
        dx_h=Q(np.asarray(geom.dx_h, np.float64), M),
        dy=Q(float(geom.dy), M),
        heightmap=Q(np.asarray(geom.heightmap, np.float64), M),
        ptop=Q(float(geom.ptop), PA),
        # sig/sigt/sigb/dsig and the polar mask are dimensionless ratios:
        # plain arrays combine with Q transparently (DIMENSIONLESS default)
    )


@pytest.fixture()
def tagged_constants(monkeypatch):
    """Dimension-tag the physical constants the oracle reads."""
    monkeypatch.setattr(constants, "P0", Q(constants.P0, PA))
    monkeypatch.setattr(constants, "Rd", Q(constants.Rd, J_PER_KG_K))
    monkeypatch.setattr(constants, "Cp", Q(constants.Cp, J_PER_KG_K))
    monkeypatch.setattr(constants, "G", Q(constants.G, M_PER_S2))
    # kappa = Rd/Cp is a dimensionless exponent; leave it a plain float


def _tagged_state(H, W, L, geom):
    rng = np.random.default_rng(0)
    p = Q(1e5 * (1 + 1e-3 * rng.standard_normal((H, W))), PA)
    u = Q(0.5 * rng.standard_normal((L, H, W)), M_PER_S)
    v = Q(0.5 * rng.standard_normal((L, H, W)), M_PER_S)
    tp = (1e5 * np.asarray(geom.sig)[:, None, None]
          + float(geom.ptop) * np.ones((L, H, W)))
    p0 = dm.mag(constants.P0)  # raw magnitudes: only build tagged inputs
    t = Q((300.0 + rng.standard_normal((L, H, W)))
          * (p0 / tp) ** constants.kappa, K)
    q = Q(1e-5 * (1 + 0.1 * rng.random((L, H, W))), DIMENSIONLESS)
    return p, u, v, t, q


def test_matsuno_step_dimensions():
    """The full oracle Matsuno step is dimensionally consistent end to end,
    and the tagged run computes exactly the same numbers as the plain one."""
    H, W, L = 8, 16, 3
    geom = geometry.gen_geometry(H, W, L, sig_func=geometry.manabe_sig)
    tgeom = _tagged_geom(geom)
    p, u, v, t, q = _tagged_state(H, W, L, geom)

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(constants, "P0", Q(constants.P0, PA))
        mp.setattr(constants, "Rd", Q(constants.Rd, J_PER_KG_K))
        mp.setattr(constants, "Cp", Q(constants.Cp, J_PER_KG_K))
        mp.setattr(constants, "G", Q(constants.G, M_PER_S2))
        out = numpy_ref.matsuno_timestep_np(p, u, v, t, q,
                                            Q(300.0, dm.S), tgeom)
    want = (PA, M_PER_S, M_PER_S, K, DIMENSIONLESS)
    names = ("p", "u", "v", "t", "q")
    for name, field, dim in zip(names, out, want):
        assert isinstance(field, Q), f"{name} lost its dimension tag"
        assert field.dim == dim, (
            f"{name}: got {dm.fmt(field.dim)}, want {dm.fmt(dim)}")
        assert np.all(np.isfinite(field.mag))

    # tagging is semantically invisible: same floats as the untagged oracle
    plain = numpy_ref.matsuno_timestep_np(
        p.mag, u.mag, v.mag, t.mag, q.mag, 300.0, geom)
    for name, tagged_f, plain_f in zip(names, out, plain):
        np.testing.assert_array_equal(tagged_f.mag, plain_f, err_msg=name)


def test_intermediate_dimensions(tagged_constants):
    """Spot-check tendency dimensions against the physical expectation."""
    H, W, L = 8, 16, 3
    plain_geom = geometry.gen_geometry(H, W, L, sig_func=geometry.manabe_sig)
    geom = _tagged_geom(plain_geom)
    p, u, v, t, q = _tagged_state(8, 16, 3, plain_geom)

    pu = u * numpy_ref.iph(p)
    pv = v * numpy_ref.jph(p)
    pit, sd = numpy_ref.aflux_np(pu, pv, geom)
    # column mass convergence: Pa/s
    assert pit.dim == dm._combine(PA, dm.S, sign=-1)
    assert sd.dim == pit.dim

    phi = numpy_ref.geopotential_np(p, t, geom)
    assert phi.dim == dm.M2_PER_S2

    pgfu, pgfv, phiu, phiv = numpy_ref.pgf_np(p, t, geom)
    # momentum-flux tendency: Pa * m/s^2
    want = dm._combine(PA, M_PER_S2)
    for f in (pgfu, pgfv, phiu, phiv):
        assert f.dim == want

    dut, dvt = numpy_ref.advec_m_pu_np(u, v, pu, pv, geom)
    assert dut.dim == want and dvt.dim == want


def test_dimension_errors_raise(tagged_constants):
    """The wrapper actually rejects inconsistency (it is not a pass-through)."""
    a = Q(np.ones(4), PA)
    b = Q(np.ones(4), M_PER_S)
    with pytest.raises(DimensionError):
        a + b
    with pytest.raises(DimensionError):
        np.maximum(a, b)
    with pytest.raises(DimensionError):
        a ** 0.5 + b  # Pa^(1/2) is a non-integer dimension
    with pytest.raises(DimensionError):
        np.exp(a)  # transcendental of a dimensional quantity
    with pytest.raises(DimensionError):
        np.concatenate([a, b])
    # a deliberately broken physics expression: adding p to phi
    plain_geom = geometry.gen_geometry(8, 16, 3, sig_func=geometry.manabe_sig)
    geom = _tagged_geom(plain_geom)
    p, u, v, t, q = _tagged_state(8, 16, 3, plain_geom)
    phi = numpy_ref.geopotential_np(p, t, geom)
    with pytest.raises(DimensionError):
        phi + p


def test_thermo_twin_dimensions(tagged_constants):
    """The thermodynamics helpers are dimensionally sound on tagged input."""
    tp = Q(np.full((3, 4, 4), 9e4), PA)
    t_pot = Q(np.full((3, 4, 4), 300.0), K)
    tt = t_pot / ((constants.P0 / tp) ** constants.kappa)
    assert tt.dim == K
    rho = tp / (constants.Rd * tt)
    assert rho.dim == KG_PER_M3
