"""Numerical diagnostics: total variation, Courant number, safe division.

JAX twins of the unit-aware helpers in reference ``constants.py:105-121``.
These are the guards the reference test-suite leans on (stability monitoring,
NaN sweeps, CFL checks — see SURVEY.md section 4 category 3).
"""

import jax.numpy as jnp

from gcmiipy_tpu import constants


def get_total_variation(q):
    """Sum of |q_{i+1} - q_i| along the leading axis (reference constants.py:105-108)."""
    diff = q - jnp.roll(q, -1, axis=0)
    return jnp.sum(jnp.abs(diff))


def courant_number(p, u, dx, dt):
    """(max u + sqrt(mean(p) g)) dt / dx (reference constants.py:111-112).

    For shallow water ``p`` is the height field, so sqrt(p*g) is the gravity
    wave speed.
    """
    return (jnp.max(u) + jnp.sqrt(jnp.mean(p) * constants.G)) * dt / dx


def safe_div(a, b):
    """a/b with 0 where b == 0 (reference constants.py:115-117)."""
    nz = b != 0
    return jnp.where(nz, a / jnp.where(nz, b, 1), jnp.zeros_like(a))


def potential_temp_to_temp(p, t):
    """Potential -> true temperature (reference constants.py:120-121)."""
    return t / (constants.P0 / p) ** constants.kappa


def any_nan(*arrays):
    """True if any array contains a NaN — the reference's blow-up guard
    (reference no_limits_2_5d.py:213, matsuno_c_grid.py:184)."""
    flags = [jnp.any(jnp.isnan(a)) for a in arrays]
    out = flags[0]
    for f in flags[1:]:
        out = jnp.logical_or(out, f)
    return out
