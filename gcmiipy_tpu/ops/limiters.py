"""Flux limiters and upwind flux builders.

JAX twin of reference ``flux_limiter.py`` plus the GCM-II +-0.5*QT flux clamp
(reference ``port_one_d.py:246-251``).  All selects are ``jnp.where`` so they
stay branchless under jit and inside Pallas kernels.
"""

import jax.numpy as jnp

from gcmiipy_tpu.ops.stencil import im, ip


def van_leer(r):
    """Van Leer limiter psi(r) = (r + |r|)/(1 + |r|) (reference flux_limiter.py:10-11)."""
    return (r + jnp.abs(r)) / (1 + jnp.abs(r))


def calc_r(q):
    """Slope ratio r = (q_i - q_{i-1}) / (q_{i+1} - q_i), 0 where the
    denominator vanishes (reference flux_limiter.py:14-20)."""
    a = q - im(q)
    b = ip(q) - q
    return jnp.where(b != 0, a / jnp.where(b != 0, b, 1), jnp.zeros_like(a))


def donor_cell_flux(q, u):
    """First-order upwind flux at i+1/2 (reference flux_limiter.py:23-27)."""
    q_edge = jnp.where(u > 0, q, ip(q))
    return q_edge * u


def donor_cell_advection(q, u, dx, dt):
    """One forward-Euler donor-cell step (reference flux_limiter.py:30-32)."""
    flux = donor_cell_flux(q, u)
    return q + (im(flux) - flux) * dt / dx


def limit_flux(q, u, dx=None):
    """Upwind interface value times velocity (reference primitive_momentum_1d.py:31-38)."""
    q_h = jnp.where(u < 0, ip(q), q)
    return q_h * u


def gcm2_limit_flux(fluxq, qt_scaled):
    """GCM-II ADVECQ flux clamp: |flux| may not exceed half the upstream
    scaled tracer mass (reference port_one_d.py:246-251)."""
    half = qt_scaled / 2
    return jnp.maximum(jnp.minimum(fluxq, half), -ip(half))
