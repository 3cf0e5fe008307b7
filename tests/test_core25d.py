"""2.5D dynamical-core correctness: hand-derived oracles, conservation laws,
fixed points and stability runs (the reference's behavioral oracles,
SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np

from gcmiipy_tpu import constants
from gcmiipy_tpu.dynamics import core25d, energy
from gcmiipy_tpu.grid import geometry
from gcmiipy_tpu.model import state as state_mod


def _uniform_state(geom, tt0=300.0, dtype=jnp.float64):
    L, H, W = geom.layers, geom.height, geom.width
    p = jnp.full((H, W), 1.0e5, dtype=dtype)
    u = jnp.zeros((L, H, W), dtype=dtype)
    v = jnp.zeros((L, H, W), dtype=dtype)
    sig = jnp.asarray(geom.sig, dtype)
    tp = p * sig + jnp.asarray(geom.ptop, dtype)
    from gcmiipy_tpu.physics import thermo
    t = thermo.to_potential_temp(jnp.full((L, H, W), tt0, dtype=dtype), tp)
    q = jnp.full((L, H, W), 1e-5, dtype=dtype)
    return p, u, v, t, q


def test_aflux_uniform_is_zero():
    geom = geometry.gen_geometry(6, 8, 3)
    pu = jnp.full((3, 6, 8), 2.0)
    pv = jnp.full((3, 6, 8), -1.0)
    pit, sd = core25d.aflux(pu, pv, geom)
    np.testing.assert_allclose(pit, 0.0, atol=1e-10)
    np.testing.assert_allclose(sd, 0.0, atol=1e-10)


def test_aflux_hand_derived():
    # single nonzero pu at (k=0, j=1, i=2) on a square grid, dsig uniform
    geom = geometry.gen_square_geometry(4, 4, 2, dx=10.0, dy=10.0)
    pu = jnp.zeros((2, 4, 4)).at[0, 1, 2].set(5.0)
    pv = jnp.zeros((2, 4, 4))
    pit, sd = core25d.aflux(pu, pv, geom)
    # conv[0,1,2] = 5/10 * 0.5 = 0.25 ; conv[0,1,3] = -0.25
    np.testing.assert_allclose(pit[1, 2], 0.25)
    np.testing.assert_allclose(pit[1, 3], -0.25)
    assert float(jnp.sum(jnp.abs(pit))) == 0.5
    # sd[0] pinned to zero by the surface BC
    np.testing.assert_allclose(sd[0], 0.0, atol=1e-14)
    # sd[1] = suffix-sum(conv)[1] - pit*sigb[1]; conv[1]=0, sigb[1]=0.5
    np.testing.assert_allclose(sd[1, 1, 2], 0.0 - 0.25 * 0.5)


def test_advec_sig_zero_sd():
    geom = geometry.gen_geometry(4, 4, 3)
    q = jnp.asarray(np.random.default_rng(0).normal(size=(3, 4, 4)))
    out = core25d.advec_sig(jnp.zeros_like(q), q, geom)
    np.testing.assert_allclose(out, 0.0, atol=1e-14)


def test_geopotential_monotonic_and_formulations_agree():
    geom = geometry.gen_geometry(4, 4, 9, sig_func=geometry.manabe_sig)
    p, u, v, t, q = _uniform_state(geom)
    phi_giss = core25d.compute_geopotential(p, t, geom)
    phi_hydro = core25d.compute_geopotential_hydrostatic(p, t, geom)
    # phi increases upward (k increases upward: sige goes 1 -> 0)
    assert np.all(np.diff(np.asarray(phi_giss[:, 0, 0])) > 0)
    assert np.all(np.diff(np.asarray(phi_hydro[:, 0, 0])) > 0)
    # the two ladders differ by a bottom-level offset (the reference prints
    # both and only asserts their units match, dynamics.py:137-140); their
    # layer-to-layer increments approximate the same hydrostatic thickness
    np.testing.assert_allclose(np.diff(np.asarray(phi_giss), axis=0),
                               np.diff(np.asarray(phi_hydro), axis=0),
                               rtol=0.05)


def test_uniform_state_is_fixed_point():
    geom = geometry.gen_geometry(6, 8, 3, sig_func=geometry.manabe_sig)
    p, u, v, t, q = _uniform_state(geom)
    p2, u2, v2, t2, q2 = core25d.matsuno_timestep(p, u, v, t, q, 900.0, geom)
    np.testing.assert_allclose(p2, p, rtol=1e-12)
    np.testing.assert_allclose(u2, u, atol=1e-9)
    np.testing.assert_allclose(v2, v, atol=1e-9)
    np.testing.assert_allclose(t2, t, rtol=1e-12)
    np.testing.assert_allclose(q2, q, rtol=1e-12)


def test_mass_conservation_perturbed():
    # sum(p) is exactly conserved: zonal differences telescope per row
    # (dx_j constant per row), meridional telescope over periodic j
    geom = geometry.gen_geometry(8, 8, 3, sig_func=geometry.manabe_sig)
    p, u, v, t, q = _uniform_state(geom)
    v = v.at[0, 0, 0].set(0.1)
    p = p.at[3, 4].mul(1.01)
    total0 = float(jnp.sum(p))
    step = jax.jit(lambda *s: core25d.matsuno_timestep(*s, 900.0, geom))
    for _ in range(5):
        p, u, v, t, q = step(p, u, v, t, q)
    np.testing.assert_allclose(float(jnp.sum(p)), total0, rtol=1e-12)


def test_tracer_mass_conservation():
    # sum(q * p * dsig) conserved exactly (flux form + telescoping)
    geom = geometry.gen_geometry(8, 8, 3, sig_func=geometry.manabe_sig)
    p, u, v, t, q = _uniform_state(geom)
    rng = np.random.default_rng(1)
    q = jnp.asarray(1e-5 * (1 + 0.5 * rng.random((3, 8, 8))))
    v = v.at[0, 0, 0].set(0.1)
    dsig = jnp.asarray(geom.dsig)
    total0 = float(jnp.sum(q * p * dsig))
    step = jax.jit(lambda *s: core25d.matsuno_timestep(*s, 900.0, geom))
    for _ in range(5):
        p, u, v, t, q = step(p, u, v, t, q)
    np.testing.assert_allclose(float(jnp.sum(q * p * dsig)), total0, rtol=1e-11)


def test_polar_v_boundary_enforced():
    geom = geometry.gen_geometry(6, 8, 3)
    p, u, v, t, q = _uniform_state(geom)
    v = v + 0.01
    _, _, v2, _, _ = core25d.matsuno_timestep(p, u, v, t, q, 300.0, geom)
    np.testing.assert_allclose(v2[:, -1, :], 0.0, atol=1e-14)


def test_reference_config_stability_run():
    # the reference main() config: 8x8x3, manabe sigma, dt=1800 s
    # (no_limits_2_5d.py:263); run 100 steps, require finiteness and
    # bounded energy drift (conservation oracle no_limits_2_5d.py:35-60)
    geom = geometry.gen_geometry(8, 8, 3, sig_func=geometry.manabe_sig)
    prog, ground = state_mod.gen_initial_conditions(geom, dtype=jnp.float64)
    p, u, v, t, q = prog
    u = jnp.zeros_like(u)
    v = v.at[0, 0, 0].set(0.1)
    e0 = energy.calc_energy(p, u, v, t, q, geom)[3]

    def many(pp, uu, vv, tt_, qq):
        def body(carry, _):
            return core25d.matsuno_timestep(*carry, 1800.0, geom), None
        out, _ = jax.lax.scan(body, (pp, uu, vv, tt_, qq), None, length=100)
        return out
    p, u, v, t, q = jax.jit(many)(p, u, v, t, q)
    assert np.isfinite(np.asarray(p)).all()
    assert np.isfinite(np.asarray(u)).all()
    e1 = energy.calc_energy(p, u, v, t, q, geom)[3]
    assert abs(float(e1 - e0)) / float(e0) < 1e-3


def test_coriolis_flag():
    geom = geometry.gen_geometry(8, 8, 3, sig_func=geometry.manabe_sig)
    p, u, v, t, q = _uniform_state(geom)
    u = u + 5.0  # uniform zonal wind
    _, _, v_off, _, _ = core25d.matsuno_timestep(p, u, v, t, q, 900.0, geom,
                                                 coriolis=False)
    _, _, v_on, _, _ = core25d.matsuno_timestep(p, u, v, t, q, 900.0, geom,
                                                coriolis=True)
    # with Coriolis on, a uniform zonal wind induces meridional acceleration
    assert float(jnp.max(jnp.abs(v_on - v_off))) > 1e-8


def test_calc_energy_positive_components():
    geom = geometry.gen_geometry(8, 8, 3, sig_func=geometry.manabe_sig)
    p, u, v, t, q = _uniform_state(geom)
    u = u + 10.0
    ke, ate, geo, tot = energy.calc_energy(p, u, v, t, q, geom)
    assert float(ke) > 0 and float(ate) > 0 and float(geo) > 0
    np.testing.assert_allclose(float(tot), float(ke + ate + geo))
    # KE = 0.5 m v^2 check: airmass * 100 / 2
    assert float(ke) / float(ate) < 1e-3  # KE tiny vs thermal energy


def test_q_limiter_matches_oracle():
    """core25d with the GCM-II +-0.5*QT q-flux clamp == the NumPy oracle
    extension at f64 over 5 steps."""
    from gcmiipy_tpu.oracle import numpy_ref

    geom = geometry.gen_geometry(16, 24, 3, sig_func=geometry.manabe_sig)
    rng = np.random.default_rng(40)
    H, W, L = 16, 24, 3
    p = 1e5 * (1 + 1e-3 * rng.standard_normal((H, W)))
    u = 30.0 * rng.standard_normal((L, H, W))   # strong winds: clamp active
    v = 30.0 * rng.standard_normal((L, H, W))
    tp = p[None] * np.asarray(geom.sig) + float(geom.ptop)
    t = (300.0 + rng.standard_normal((L, H, W))) \
        * (constants.P0 / tp) ** constants.kappa
    q = 1e-5 * (1 + 0.1 * rng.random((L, H, W)))
    state_j = tuple(jnp.asarray(x) for x in (p, u, v, t, q))
    state_o = (p, u, v, t, q)
    for _ in range(5):
        state_j = core25d.matsuno_timestep(*state_j, 60.0, geom,
                                           q_limiter=True)
        state_o = numpy_ref.matsuno_timestep_np(*state_o, 60.0, geom,
                                                q_limiter=True)
    for name, a, b in zip("puvtq", state_o, state_j):
        np.testing.assert_allclose(np.asarray(b), a, rtol=1e-10, atol=1e-12,
                                   err_msg=f"field {name}")


def test_q_limiter_weak_winds_identity():
    """With weak winds no face moves half its donor's mass: the clamp is
    EXACTLY advec_t."""
    geom = geometry.gen_geometry(16, 24, 3, sig_func=geometry.manabe_sig)
    rng = np.random.default_rng(41)
    H, W, L = 16, 24, 3
    p = jnp.asarray(1e5 * np.ones((H, W)))
    u = jnp.asarray(0.5 * rng.standard_normal((L, H, W)))
    v = jnp.asarray(0.5 * rng.standard_normal((L, H, W)))
    q = jnp.asarray(1e-5 * (1 + 0.1 * rng.random((L, H, W))))
    pu = core25d.calc_pu(p, u)
    pv = core25d.calc_pv(p, v)
    lim = core25d.advec_q_limited(pu, pv, q, q * p, 60.0, geom)
    unl = core25d.advec_t(pu, pv, q, geom)
    np.testing.assert_allclose(np.asarray(lim), np.asarray(unl),
                               rtol=1e-12, atol=1e-20)


def test_q_limiter_bounds_face_flux():
    """Under violent winds the clamp keeps every face's per-step tracer
    transfer within half the donor mass (the unclamped form exceeds it)."""
    from gcmiipy_tpu.ops.stencil import iph, ipj

    geom = geometry.gen_geometry(16, 24, 3, sig_func=geometry.manabe_sig)
    rng = np.random.default_rng(42)
    H, W, L = 16, 24, 3
    p = jnp.asarray(1e5 * np.ones((H, W)))
    u = jnp.asarray(3000.0 * rng.standard_normal((L, H, W)))
    v = jnp.zeros((L, H, W))
    q = jnp.asarray(1e-5 * (1 + 0.1 * rng.random((L, H, W))))
    dt = 60.0
    pu = core25d.calc_pu(p, u)
    qp = q * p
    rdx = 1.0 / jnp.asarray(geom.dx_j)
    raw = np.asarray(pu * iph(q) * (dt * rdx))
    half = np.asarray(0.5 * qp)
    assert (raw > half).any()   # the clamp has something to do
    clamped = np.clip(raw, -np.asarray(ipj(0.5 * qp)), half)
    assert (clamped <= half + 1e-18).all()
    # and the tendency built from clamped fluxes differs from the raw one
    lim = core25d.advec_q_limited(pu, jnp.zeros_like(pu), q, qp, dt, geom)
    unl = core25d.advec_t(pu, jnp.zeros_like(pu), q, geom)
    assert not np.allclose(np.asarray(lim), np.asarray(unl))


def test_q_limiter_in_kernels():
    """The v4 kernel and the streaming kernel inherit the clamp through
    the shared body (interpret mode, f64)."""
    from gcmiipy_tpu.dynamics import fused
    from gcmiipy_tpu.ops import pallas_stream as pstream
    from gcmiipy_tpu.ops import pallas_stencil as ps

    geom = geometry.gen_geometry(16, 128, 3, sig_func=geometry.manabe_sig)
    rng = np.random.default_rng(43)
    H, W, L = 16, 128, 3
    p = jnp.asarray(1e5 * (1 + 1e-3 * rng.standard_normal((H, W))))
    u = jnp.asarray(30.0 * rng.standard_normal((L, H, W)))
    v = jnp.asarray(30.0 * rng.standard_normal((L, H, W)))
    tp = np.asarray(p)[None] * np.asarray(geom.sig) + float(geom.ptop)
    t = jnp.asarray((300.0 + rng.standard_normal((L, H, W)))
                    * (constants.P0 / tp) ** constants.kappa)
    q = jnp.asarray(1e-5 * (1 + 0.1 * rng.random((L, H, W))))
    state = (p, u, v, t, q)

    ref = state
    for _ in range(2):
        ref = core25d.matsuno_timestep(*ref, 60.0, geom, q_limiter=True)

    step4 = fused.make_fused_matsuno_padded_v4(
        geom, 60.0, dtype=jnp.float64, interpret=True, q_limiter=True)
    st = tuple(ps.pad_rows(x) for x in state)
    for _ in range(2):
        st = step4(*st)
    out4 = tuple(ps.core_rows(x) for x in st)
    for name, a, b in zip("puvtq", ref, out4):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-11, atol=1e-11,
                                   err_msg=f"v4 field {name}")

    adv = pstream.make_stream_matsuno(geom, 60.0, steps_per_launch=2,
                                      dtype=jnp.float64, tile_j=8,
                                      interpret=True, q_limiter=True)
    outs = adv(*state, 2)
    for name, a, b in zip("puvtq", ref, outs):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-11, atol=1e-11,
                                   err_msg=f"stream field {name}")
