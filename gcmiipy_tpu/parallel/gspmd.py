"""GSPMD execution of the model step over a device mesh.

The idiomatic-TPU baseline parallel path: annotate the state pytree with
``NamedSharding`` over the ('y','x') mesh and jit the full step — XLA/GSPMD
inserts the halo collective-permutes for every roll-based stencil and the
collectives behind the polar filter.  (The explicit-halo ``shard_map`` path
in ``shard_step.py`` is the hand-optimized alternative; this one is the
always-correct reference for it.)

No NCCL/MPI analog is needed: ICI/DCN routing is the compiler's job
(SURVEY.md section 2.9, section 5.8).
"""

import functools

import jax

from gcmiipy_tpu.model import driver as driver_mod
from gcmiipy_tpu.parallel import mesh as mesh_mod


def make_sharded_run_fn(geom, config, timesteps, mesh):
    """Like driver.make_run_fn but with mesh-sharded donated state."""
    filter_fn = driver_mod.make_filter_fn(config, geom)
    shardings = mesh_mod.state_shardings(mesh)

    def body(state, _):
        state = driver_mod.full_timestep(state, geom, config, filter_fn)
        stats = driver_mod.collect_stats(state, geom) if config.stats else None
        return state, stats

    @functools.partial(jax.jit, donate_argnums=0, in_shardings=(shardings,),
                       out_shardings=(shardings, None))
    def run(state):
        return jax.lax.scan(body, state, None, length=timesteps)

    return run


def shard_state(state, mesh):
    """Place a ModelState onto the mesh with the canonical shardings."""
    return jax.device_put(state, mesh_mod.state_shardings(mesh))
