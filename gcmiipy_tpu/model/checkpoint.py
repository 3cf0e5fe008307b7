"""Checkpoint / resume of the model state.

The reference never persists anything: state is 5 arrays + a ground
namedtuple returned from ``run_model`` (reference ``no_limits_2_5d.py:236``;
SURVEY.md section 5.4).  Here the full :class:`ModelState` pytree is saved
either via orbax (async-capable, multi-host-aware — the production path) or
as a plain ``.npz`` (dependency-free fallback).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from gcmiipy_tpu.model.state import GroundVars, ModelState, PrognosticVars


def save_checkpoint(path, state: ModelState, step: int, use_orbax=True):
    """Write ``state`` at ``step`` under ``path`` (a directory).

    Host-aware: under multi-process execution the (DCN-sharded) state is
    gathered to a full host replica on every process
    (:func:`gcmiipy_tpu.parallel.distributed.fully_replicated_host_copy`
    — a non-addressable shard cannot be ``np.asarray``'d), process 0
    writes, and all processes synchronize before returning so a restore
    on any host sees the finished file."""
    from gcmiipy_tpu.parallel import distributed

    path = os.path.abspath(path)
    host_state = distributed.fully_replicated_host_copy(state)
    writer = not distributed.is_multiprocess() or jax.process_index() == 0
    if use_orbax and writer:
        try:
            import orbax.checkpoint as ocp
            ckptr = ocp.PyTreeCheckpointer()
            ckptr.save(os.path.join(path, f"step_{step:010d}"), host_state)
            distributed.barrier("checkpoint_save")
            return
        except ImportError:
            pass
    elif use_orbax:
        try:
            import orbax.checkpoint  # noqa: F401  match the writer's path
            distributed.barrier("checkpoint_save")
            return
        except ImportError:
            pass
    if writer:
        os.makedirs(path, exist_ok=True)
        flat = {
            "p": host_state.prog.p, "u": host_state.prog.u,
            "v": host_state.prog.v,
            "t": host_state.prog.t, "q": host_state.prog.q,
            "gt": host_state.ground.gt, "gw": host_state.ground.gw,
            "snow": host_state.ground.snow, "ice": host_state.ground.ice,
            "utc": host_state.utc, "step": host_state.step,
        }
        np.savez(os.path.join(path, f"step_{step:010d}.npz"),
                 **{k: np.asarray(v) for k, v in flat.items()})
    distributed.barrier("checkpoint_save")


def latest_step(path):
    """Return the newest checkpointed step under ``path``, or None."""
    if not os.path.isdir(path):
        return None
    steps = []
    for name in os.listdir(path):
        if name.startswith("step_"):
            steps.append(int(name[5:].removesuffix(".npz")))
    return max(steps) if steps else None


def restore_checkpoint(path, step=None, use_orbax=True):
    """Load a ModelState; newest step when ``step`` is None."""
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    npz = os.path.join(path, f"step_{step:010d}.npz")
    if os.path.exists(npz):
        data = np.load(npz)
        state = ModelState(
            PrognosticVars(*(jnp.asarray(data[k]) for k in "puvtq")),
            GroundVars(*(jnp.asarray(data[k])
                         for k in ("gt", "gw", "snow", "ice"))),
            jnp.asarray(data["utc"]),
            # the filename step is authoritative (also covers checkpoints
            # written before the counter existed)
            jnp.asarray(step, jnp.int32),
        )
        return state, step
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.join(path, f"step_{step:010d}"))
    # orbax returns NamedTuples as plain dicts keyed by field name
    prog = restored["prog"]
    ground = restored["ground"]
    state = ModelState(
        PrognosticVars(*(jnp.asarray(prog[k]) for k in PrognosticVars._fields)),
        GroundVars(*(jnp.asarray(ground[k]) for k in GroundVars._fields)),
        jnp.asarray(restored["utc"]),
        jnp.asarray(step, jnp.int32),
    )
    return state, step
