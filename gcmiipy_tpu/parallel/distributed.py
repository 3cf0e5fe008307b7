"""Multi-host (multi-process) execution support.

The reference is a single NumPy process (SURVEY.md section 2.9); the
BASELINE scaling target is "1 chip -> 1 host -> N hosts".  This module
carries the N-hosts leg: ``jax.distributed`` initialization (DCN
coordination), global-state construction from per-process replicas, and
host-aware checkpoint gathering.  The decomposition paths themselves
(:mod:`gcmiipy_tpu.parallel.shard_step`) are mesh-shape-agnostic — a mesh
built over ``jax.devices()`` after :func:`initialize` spans all hosts, and
the same ``shard_map`` collectives ride ICI within a host and DCN across
hosts (XLA routes them; no code change per path).

Proven end-to-end by ``scripts/multihost_dryrun.py``: two spawned CPU
processes (Gloo collectives), the production lat-ring stream path over the
cross-process mesh, results == single-process at 1e-9 f64.
"""

import os

import jax
import numpy as np


def initialize(coordinator_address=None, num_processes=None,
               process_id=None, local_device_count=None):
    """Initialize the jax distributed runtime (idempotent).

    Arguments fall back to the standard environment variables
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``) that cluster launchers set; on managed platforms
    (GKE/TPU pods) ``jax.distributed.initialize()`` auto-detects and all
    arguments may be None.  A no-op when neither arguments nor
    environment request multi-process execution, so single-process runs
    never pay for it.

    ``local_device_count``: optional per-process virtual CPU device count
    (testing multi-host on CPU hosts) — must be set before any jax
    backend initialization.
    """
    coordinator_address = (coordinator_address
                          or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False  # single-process run
    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                f"{local_device_count}").strip()
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def is_multiprocess():
    return jax.process_count() > 1


def make_global_array(full, sharding):
    """Build a (possibly multi-host) sharded jax.Array from a full
    host-side replica.

    Every process passes the SAME full array (the deterministic initial
    conditions / a restored checkpoint are identical on every host);
    each process contributes only its addressable shards.  On one
    process this is just ``jax.device_put``.
    """
    full = np.asarray(full)
    if not full.ndim:
        return jax.make_array_from_callback(full.shape, sharding,
                                            lambda idx: full)
    return jax.make_array_from_callback(
        full.shape, sharding, lambda idx: full[idx])


def make_global_state(state, shardings):
    """Shard a fully-replicated ModelState pytree across a (multi-host)
    mesh: the pytree twin of :func:`make_global_array`."""
    return jax.tree.map(make_global_array, jax.tree.map(np.asarray, state),
                        shardings)


def fully_replicated_host_copy(tree):
    """Gather a (possibly multi-host-sharded) pytree to full host NumPy
    arrays on EVERY process — the host-aware form of ``jax.device_get``
    used by checkpointing (a non-addressable shard cannot be np.asarray'd
    directly)."""
    if not is_multiprocess():
        return jax.device_get(tree)
    from jax.experimental import multihost_utils
    return jax.device_get(multihost_utils.process_allgather(
        tree, tiled=True))


def barrier(name="gcmiipy_barrier"):
    """Cross-process sync point (no-op single-process)."""
    if is_multiprocess():
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)
