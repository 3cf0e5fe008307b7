"""Data-parallel ensemble axis (SURVEY.md section 2.9 row 1).

The reference's only DP analog is running independent ``run_model``
configurations by hand (reference ``no_limits_2_5d.py:220``).  TPU-natively
an ensemble is one more mesh axis: every state leaf gains a leading member
axis sharded over ``'e'``, the per-member step is ``jax.vmap`` of the
single-model step, and XLA keeps members fully independent (no collectives
— pure data parallelism; spatial decomposition composes on the remaining
mesh axes if present).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gcmiipy_tpu.model import driver as driver_mod
from gcmiipy_tpu.parallel import mesh as mesh_mod


def make_ensemble_mesh(n_devices=None, devices=None):
    """1D ('e',) mesh over the ensemble axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    return Mesh(np.asarray(devices[:n_devices]), ("e",))


def ensemble_shardings(mesh):
    """State shardings with a leading member axis over 'e' (other state
    dims follow :func:`mesh_mod.state_specs` — unsharded on a pure-'e'
    mesh, spatially decomposed when the mesh also has 'y'/'x' axes)."""
    has_yx = "y" in mesh.axis_names

    def widen(spec):
        tail = tuple(spec) if has_yx else (None,) * len(spec)
        return NamedSharding(mesh, P("e", *tail))

    return jax.tree.map(widen, mesh_mod.state_specs(),
                        is_leaf=lambda x: isinstance(x, P))


def stack_states(states):
    """Stack per-member ModelStates into one ensemble state pytree."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def make_ensemble_run_fn(geom, config, timesteps, mesh):
    """Jitted ensemble run: ``run(stacked_states) -> (states, stats)`` with
    every leaf carrying a leading member axis sharded over ``mesh``'s 'e'
    axis.  Stats (when on) come back per member per step."""
    filter_fn = driver_mod.make_filter_fn(config, geom)
    dynamics_step = driver_mod.make_dynamics_step(geom, config, filter_fn)

    def body(state, _):
        state = driver_mod.full_timestep(state, geom, config, filter_fn,
                                         dynamics_step)
        stats = (driver_mod.collect_stats(state, geom)
                 if config.stats else 0.0)
        return state, stats

    def run_member(state):
        return jax.lax.scan(body, state, None, length=timesteps)

    shardings = ensemble_shardings(mesh)

    @functools.partial(jax.jit, donate_argnums=0, in_shardings=(shardings,),
                       out_shardings=(shardings, None))
    def run(states):
        return jax.vmap(run_member)(states)

    return run
