"""Run harnesses with stability guards.

JAX twins of the reference's interactive runners — ``run_1d_with_ft`` /
``run_2d_with_ft`` (reference ``just_units.py:298-340``,
``two_d.py:306-346``) and ``run_shallow_with_bed``
(reference ``primitive_1d.py:164-187``) — minus matplotlib: each runs a
stepper under ``lax.scan`` with total-variation / NaN blow-up detection and
returns (final_state, stable, history).  The guards are the reference's
behavioral oracles (SURVEY.md section 4 category 3), evaluated on-device.
"""

import jax
import jax.numpy as jnp

from gcmiipy_tpu.diagnostics import courant_number, get_total_variation


def run_guarded(step_fn, state, steps, variation_of=None, variation_slack=1e3,
                collect=None):
    """Run ``step_fn`` (state -> state) ``steps`` times under scan.

    ``variation_of``: function state -> array whose total variation is
    guarded (reference guard: fail when TV grows past initial + slack or a
    NaN appears, just_units.py:327-332).  Once tripped, the state freezes so
    blow-ups cannot overflow into inf arithmetic.

    Returns (final_state, stable: bool, history) where history stacks
    ``collect(state)`` per step (or None).
    """
    if variation_of is None:
        variation_of = lambda s: jax.tree.leaves(s)[0]

    initial_tv = get_total_variation(variation_of(state))

    def body(carry, _):
        s, ok = carry
        s_next = step_fn(s)
        field = variation_of(s_next)
        tv = get_total_variation(field)
        fine = jnp.logical_and(tv <= initial_tv + variation_slack,
                               jnp.logical_not(jnp.any(jnp.isnan(field))))
        ok_next = jnp.logical_and(ok, fine)
        # freeze the state once unstable
        s_keep = jax.tree.map(lambda new, old: jnp.where(ok_next, new, old),
                              s_next, s)
        out = collect(s_keep) if collect else None
        return (s_keep, ok_next), out

    (state, ok), history = jax.lax.scan(
        body, (state, jnp.asarray(True)), None, length=steps)
    return state, ok, history


def run_shallow_with_bed(count, func, h, u, b, dt, dx):
    """Shallow-water-over-bed runner with Courant monitoring
    (reference primitive_1d.py:164-187).

    Returns (h, u, stable, max_courant).
    """
    def step(state):
        h, u = state
        return func(h, u, b, dt, dx)

    def collect(state):
        h, u = state
        return courant_number(h, u, dx, dt)

    (h, u), stable, courants = run_guarded(
        step, (h, u), count, variation_of=lambda s: s[0], collect=collect)
    return h, u, stable, jnp.max(courants)
