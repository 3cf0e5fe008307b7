"""Advection scheme zoo: transport correctness, TVD behavior, and the
convergence ("verification") test the reference documents but never
implemented (test_primitive_1d.py:420-464)."""

import jax
import jax.numpy as jnp
import numpy as np

from gcmiipy_tpu.dynamics import advection_schemes as sch
from gcmiipy_tpu.dynamics import gcm_sequence
from gcmiipy_tpu.ops import limiters


def _scan(step, state, steps):
    def body(c, _):
        return step(c), None
    out, _ = jax.lax.scan(body, state, None, length=steps)
    return out


def test_upwind_transports_square_wave():
    # reference 1D advection config: 161 cells, dx=10 m, dt=1 s, 400 steps
    # (test_oneD.py:18-32 / README)
    side = 161
    q0 = jnp.zeros(side).at[40:80].set(1.0)
    v = jnp.full(side, 2.0)
    dx, dt = 10.0, 1.0
    steps = 250  # 400 in the reference; fewer here so the diffused tail
    # does not wrap the periodic boundary and skew the center of mass
    q = _scan(lambda q: sch.ft_upwind(dt, dx, v, q), q0, steps)
    # mass conserved
    np.testing.assert_allclose(float(jnp.sum(q)), 40.0, rtol=1e-10)
    # the wave moved v*t/dx = 50 cells
    com0 = float(jnp.sum(jnp.arange(side) * q0) / jnp.sum(q0))
    com1 = float(jnp.sum(jnp.arange(side) * q) / jnp.sum(q))
    np.testing.assert_allclose(com1 - com0, 50.0, atol=1.0)


def test_upwind_exact_at_cfl_one():
    # at CFL=1 donor-cell advection is the exact shift operator
    side = 64
    q0 = jnp.zeros(side).at[10:20].set(1.0)
    v = jnp.full(side, 5.0)
    dx, dt = 5.0, 1.0  # CFL = 1
    q = sch.ft_upwind(dt, dx, v, q0)
    np.testing.assert_allclose(np.asarray(q), np.roll(np.asarray(q0), 1),
                               atol=1e-12)


def test_higher_order_upwind_less_diffusive():
    side = 200
    q0 = jnp.zeros(side).at[40:80].set(1.0)
    v = jnp.full(side, 2.0)
    dx, dt = 10.0, 1.0

    def peak_after(scheme):
        q = _scan(lambda q: scheme(dt, dx, v, q), q0, 200)
        return float(jnp.max(q))

    p1 = peak_after(sch.ft_upwind)
    p3 = peak_after(sch.upwind_third_order)
    assert p3 > p1  # third order preserves the square wave amplitude better


def test_leapfrog_second_order_neutral():
    side = 128
    x = np.arange(side)
    q0 = jnp.asarray(np.sin(2 * np.pi * x / side))
    v = jnp.full(side, 1.0)
    dx, dt = 1.0, 0.5

    def body(carry, _):
        q, q_prev = carry
        q_next = sch.leapfrog(dt, dx, v, q, q_prev)
        return (q_next, q), None

    # bootstrap with one upwind step
    q1 = sch.ft_upwind(dt, dx, v, q0)
    (q, _), _ = jax.lax.scan(body, (q1, q0), None, length=500)
    # leapfrog on a smooth wave: amplitude preserved to ~1%
    assert 0.98 < float(jnp.max(jnp.abs(q))) < 1.02


def test_convergence_rate_upwind_first_order():
    """The 'verification testing' methodology quoted by the reference
    (test_primitive_1d.py:420-434): error vs dx on an exact advection
    solution.  Donor-cell upwind must converge at O(dx^1)."""
    errors = []
    dxs = []
    for n in (64, 128, 256, 512):
        L = 1.0
        dx = L / n
        cfl = 0.5
        v_speed = 1.0
        dt = cfl * dx / v_speed
        steps = int(round(0.25 / dt))  # advect a quarter domain
        x = (np.arange(n) + 0.5) * dx
        q0 = jnp.asarray(np.sin(2 * np.pi * x))
        v = jnp.full(n, v_speed)
        q = _scan(lambda q: sch.ft_upwind(dt, dx, v, q), q0, steps)
        exact = np.sin(2 * np.pi * (x - v_speed * steps * dt))
        errors.append(float(jnp.mean(jnp.abs(q - exact))))
        dxs.append(dx)
    rates = np.diff(np.log(errors)) / np.diff(np.log(dxs))
    assert np.all(rates > 0.8), rates   # first order
    assert np.all(rates < 1.5), rates


def test_ctu_2d_diagonal_transport():
    n = 64
    q0 = np.zeros((n, n))
    q0[10:20, 10:20] = 1.0
    q0 = jnp.asarray(q0)
    V = jnp.stack([jnp.full((n, n), 1.0), jnp.full((n, n), 1.0)])
    spatial = (1.0, 1.0)
    dt = 0.5
    q = _scan(lambda q: sch.corner_transport_2d(dt, spatial, V, q), q0, 40)
    # total mass conserved, blob moved +20 in each axis
    np.testing.assert_allclose(float(jnp.sum(q)), 100.0, rtol=1e-10)
    com = np.asarray(q)
    iy = float((com.sum(1) * np.arange(n)).sum() / com.sum())
    ix = float((com.sum(0) * np.arange(n)).sum() / com.sum())
    np.testing.assert_allclose(iy, 14.5 + 20, atol=0.5)
    np.testing.assert_allclose(ix, 14.5 + 20, atol=0.5)


def test_fv_advection_conserves():
    n = 32
    rng = np.random.default_rng(0)
    q = jnp.asarray(1.0 + 0.5 * rng.random((n, n)))
    V = jnp.stack([jnp.asarray(rng.standard_normal((n, n))),
                   jnp.asarray(rng.standard_normal((n, n)))])
    spatial = (1.0, 1.0)
    total0 = float(jnp.sum(q))
    q = _scan(lambda q: sch.finite_volume_advection(0.1, spatial, V, q), q, 50)
    np.testing.assert_allclose(float(jnp.sum(q)), total0, rtol=1e-10)


def test_van_leer_limiter_properties():
    # reference flux_limiter.py:45-48 plus symmetry property
    assert float(limiters.van_leer(jnp.asarray(1.0))) == 1.0
    assert float(limiters.van_leer(jnp.asarray(0.0))) == 0.0
    r = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 1.0, 2.0, 10.0])
    psi = np.asarray(limiters.van_leer(r))
    assert np.all(psi >= 0) and np.all(psi <= 2)
    # negative r (extrema) -> limiter shuts off
    assert np.all(psi[:2] == 0)


def test_calc_r_zero_denominator():
    q = jnp.asarray([1.0, 1.0, 2.0, 2.0, 1.0])
    r = np.asarray(limiters.calc_r(q))
    assert np.isfinite(r).all()


def test_donor_cell_flux_directions():
    q = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    u_pos = jnp.full(4, 1.0)
    u_neg = jnp.full(4, -1.0)
    np.testing.assert_allclose(np.asarray(limiters.donor_cell_flux(q, u_pos)),
                               [1, 2, 3, 4])
    np.testing.assert_allclose(np.asarray(limiters.donor_cell_flux(q, u_neg)),
                               [-2, -3, -4, -1])


def test_gcm2_flux_clamp():
    # |flux| limited to half the upstream scaled tracer (port_one_d.py:246-251)
    qt = jnp.asarray([10.0, 10.0, 10.0, 10.0])
    big_flux = jnp.asarray([100.0, -100.0, 3.0, -3.0])
    out = np.asarray(limiters.gcm2_limit_flux(big_flux, qt))
    np.testing.assert_allclose(out, [5.0, -5.0, 3.0, -3.0])


def test_gcm_sequence_dynam():
    # reference port_one_d.dynam_matsuno: uniform fixed point + stability
    side = 64
    from gcmiipy_tpu import constants
    u = jnp.full(side, 10.0)
    p = jnp.full(side, constants.standard_pressure)
    t = jnp.full(side, constants.standard_temperature)
    q = jnp.zeros(side).at[16:32].set(1e-3)
    dx, dt = 100e3, 300.0
    u2, p2, t2, q2 = gcm_sequence.dynam_matsuno(u, p, t, q, dt, dx)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t), rtol=1e-12)
    # humidity total conserved under the clamped flux form
    np.testing.assert_allclose(float(jnp.sum(q2)), float(jnp.sum(q)),
                               rtol=1e-12)
    # the scheme itself is unstable in closed loop (roundoff deviations
    # grow ~10x every 4 steps even at CFL~0.1); the reference only ever
    # unit-checks dynam_matsuno and never loops it (test_primitive_1d.py:84-175),
    # so the loop here stays inside the finite envelope (50 steps at dt=10)
    state = (u, p, t, q)
    state = _scan(lambda s: gcm_sequence.dynam_matsuno(*s, 10.0, dx),
                  state, 50)
    assert all(np.isfinite(np.asarray(x)).all() for x in state)


def test_thbar_matches_geopotential_ladder():
    # pgf() uses THBAR against the mesopause; sanity: phi positive, finite
    from gcmiipy_tpu import constants
    side = 16
    u = jnp.zeros(side)
    p = jnp.full(side, constants.standard_pressure).at[5].mul(1.1)
    t = jnp.full(side, constants.standard_temperature)
    pa = p
    spa, theta, phi, geo, pg, u_next = gcm_sequence.pgf(
        u, p, pa, t, 300.0, 100e3)
    assert np.isfinite(np.asarray(phi)).all()
    assert np.all(np.asarray(phi) > 0)
    assert np.isfinite(np.asarray(u_next)).all()
