"""Thermodynamic conversions (potential <-> true temperature, density).

JAX twin of reference ``temperature.py:7-27``.  All quantities SI: pressure
[Pa], temperature [K], density [kg/m^3].
"""

import jax.numpy as jnp

from gcmiipy_tpu import constants


def to_true_temp(t, p):
    """Potential temperature -> true temperature (reference temperature.py:7-12)."""
    return t / ((constants.P0 / p) ** constants.kappa)


def to_potential_temp(tt, p):
    """True temperature -> potential temperature (reference temperature.py:15-19)."""
    return tt * ((constants.P0 / p) ** constants.kappa)


def to_density(tt, p):
    """Ideal-gas density from true temperature (reference temperature.py:22-24)."""
    return p / (constants.Rd * tt)


def exbyk(p):
    """p^kappa, GCM-II's EXPBYK (reference port.py:602-603)."""
    return p ** constants.kappa


def thbar(t1, t2):
    """Arakawa log-mean used for vertical differencing (reference port_one_d.py:128-141).

    THBAR(T1,T2) = (ln T1 - ln T2) / (1/T2 - 1/T1) = T1 * ln(x)/(x-1), x=T1/T2.
    The x -> 1 limit is t1, taken via jnp.where to stay branchless under jit.
    """
    x = t1 / t2
    safe = jnp.where(jnp.abs(x - 1) < 1e-12, 2.0, x)
    g = jnp.where(jnp.abs(x - 1) < 1e-12, 1.0, jnp.log(safe) / (safe - 1))
    return t1 * g
