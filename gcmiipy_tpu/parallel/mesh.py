"""Device mesh construction and state shardings.

The reference is single-process NumPy with ``np.roll`` periodic boundaries
standing in for halo exchange (SURVEY.md section 2.9).  The TPU-native
equivalent is a 2D (lat x lon) device mesh: fields are sharded over
``('y', 'x')``; the vertical k axis (<= 18 layers, sequential scans) stays
on-chip unsharded.

Two execution paths build on this mesh:

* GSPMD (``gcmiipy_tpu/parallel/gspmd.py``): jit with NamedSharding
  constraints; XLA inserts the halo collective-permutes and the polar-filter
  collectives automatically.
* shard_map (``gcmiipy_tpu/parallel/halo.py`` + ``shard_step.py``): explicit
  halo exchange (width 3 for the 2D decomposition, width PHJ=8 for the
  lat-ring fused path) via ``jax.lax.ppermute`` over ICI — the hand-tuned
  path.  ``make_shard_step_fused4(overlap=True)`` splits each shard into
  an interior strip whose kernel has no data dependence on the ppermutes
  (the compiler runs the exchange underneath it) plus two edge-strip
  kernels that consume the ring halo; ``overlap=False`` (default) runs
  one kernel per shard after the exchange.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def best_mesh_shape(n_devices):
    """Split n devices into a near-square (y, x) grid, x >= y.

    Longitude (x) gets the larger factor: lon is usually the longer axis and
    carries the polar-filter collectives, which ride ICI best when wide.
    """
    y = int(np.floor(np.sqrt(n_devices)))
    while n_devices % y != 0:
        y -= 1
    return (y, n_devices // y)


def make_mesh(n_devices=None, shape=None, devices=None):
    """Create a 2D ('y', 'x') device mesh."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if shape is None:
        shape = best_mesh_shape(n_devices)
    dev_array = np.asarray(devices[:shape[0] * shape[1]]).reshape(shape)
    return Mesh(dev_array, axis_names=("y", "x"))


def state_specs():
    """PartitionSpecs for the prognostic state pytree.

    p: [j, i] -> ('y','x'); u,v,t,q: [k, j, i] -> (None,'y','x');
    ground fields: [j, i] -> ('y','x'); utc scalar replicated.
    """
    surf = P("y", "x")
    full = P(None, "y", "x")
    from gcmiipy_tpu.model.state import GroundVars, ModelState, PrognosticVars
    prog = PrognosticVars(p=surf, u=full, v=full, t=full, q=full)
    ground = GroundVars(gt=surf, gw=surf, snow=surf, ice=surf)
    return ModelState(prog=prog, ground=ground, utc=P(), step=P())


def state_shardings(mesh):
    """NamedShardings for the full ModelState pytree."""
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec), state_specs(),
                        is_leaf=lambda x: isinstance(x, P))


def ring_state_specs():
    """PartitionSpecs for a latitude-ring ('y'-only) decomposition: the
    production mesh layout of the fused lat-ring kernel
    (``shard_step.make_shard_step_fused4``) — full longitude rows stay
    on-chip so the zonal polar filter needs no communication."""
    surf = P("y", None)
    full = P(None, "y", None)
    from gcmiipy_tpu.model.state import GroundVars, ModelState, PrognosticVars
    prog = PrognosticVars(p=surf, u=full, v=full, t=full, q=full)
    ground = GroundVars(gt=surf, gw=surf, snow=surf, ice=surf)
    return ModelState(prog=prog, ground=ground, utc=P(), step=P())


def ring_state_shardings(mesh):
    """NamedShardings for a lat-ring ModelState."""
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                        ring_state_specs(),
                        is_leaf=lambda x: isinstance(x, P))


def geom_specs(geom):
    """PartitionSpecs for the Geom pytree: replicate the small per-row /
    per-layer tables; shard only the (J, I) heightmap and (J, nf) polar mask
    over latitude rows.

    Everything except heightmap is O(J) or O(L) — replication is cheaper
    than the gather traffic sharding would cause.
    """
    import dataclasses
    specs = {}
    for f in dataclasses.fields(geom):
        if f.metadata.get("static", False):
            continue
        specs[f.name] = P()
    specs["heightmap"] = P("y", "x")
    specs["polar_mask"] = P("y", None)
    return dataclasses.replace(geom, **specs)
