"""Corner-transport-upwind model driver sketch.

JAX twin of reference ``model.py`` — the "advect everything with CTU"
top-level sketch (SURVEY.md section 2 #28), which also records the original
GCM-II DYNAM call order (reference ``model.py:38-45``; implemented for real
in :mod:`gcmiipy_tpu.dynamics.gcm_sequence`).
"""

import jax.numpy as jnp

from gcmiipy_tpu.dynamics.advection_schemes import corner_transport_2d


def get_initial_conditions(world_shape=(16, 32)):
    """(reference model.py:16-33): a tracer square and a velocity stripe."""
    half = world_shape[0] // 2
    quarter = half // 2
    V = jnp.zeros((2, *world_shape))
    V = V.at[0, half].set(1.0)
    p = jnp.zeros(world_shape)
    rho = jnp.zeros(world_shape)
    q = jnp.zeros(world_shape).at[quarter:half, quarter:half].set(1.0)
    t = jnp.full(world_shape, 273.15)
    return V, q, p, rho, t


def ctu_step(V, q, p, rho, t, dt=1.0, spatial_change=(10.0, 10.0)):
    """Advect every field with CTU (reference model.py:47-53)."""
    adv = lambda f: corner_transport_2d(dt, spatial_change, V, f)
    V_next = jnp.stack([adv(V[0]), adv(V[1])])
    return V_next, adv(q), adv(p), rho, adv(t)
