"""Scaling benchmark: 2.5D Matsuno throughput vs device-mesh size.

Measures grid-point-updates/s at mesh sizes (1, 2, 4, ... N) for the
parallel execution paths, and the scaling efficiency vs the 1-device run:

    efficiency(N) = points_per_sec(N) / (N * points_per_sec(1))

Paths:
  gspmd : NamedSharding-annotated jit over a ('y','x') mesh — XLA inserts
          all collectives (gcmiipy_tpu/parallel/gspmd.py)
  fused : lat-ring shard_map path — v3 mega kernel per half step,
          in-kernel DFT polar filter, ppermute halo rings
          (gcmiipy_tpu/parallel/shard_step.py:make_shard_step_fused)
  fused4: the production lat-ring path — whole-step v4 kernel, banded
          filter, ONE halo round per step (make_shard_step_fused4)
  shard : explicit-halo shard_map with the XLA core and the exact
          circulant-matmul filter (make_shard_step; small grids only —
          the (J, I, I) filter stack is O(J*I^2) memory)

On a machine without N real chips run with virtual CPU devices (default
when the default backend is not TPU): the harness forces
``--xla_force_host_platform_device_count``.  Virtual devices share one
host's cores, so absolute efficiency is meaningless there — the artifact
still proves the collectives compile/execute at every mesh size, and the
SAME harness runs unmodified on a real pod slice (BASELINE.md target:
>= 85% efficiency 1 chip -> N).

Writes a JSON artifact (--out) and prints one JSON line per (path, N).
Usage: python bench_scaling.py [--devices 1,2,4,8] [--paths gspmd,fused]
                               [--height 64 --width 256 --layers 5]
"""

import argparse
import json
import os
import sys
import time


def _force_virtual_devices(n):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"


def _timed(run_once, steps, repeats=3):
    """Best-of-repeats seconds/step of the zero-arg ``run_once``."""
    import jax
    jax.block_until_ready(run_once())   # warmup / compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run_once())
        best = min(best, time.perf_counter() - t0)
    return best / steps


def bench_gspmd(geom, config, n_dev, steps):
    import jax

    from gcmiipy_tpu.model import driver as driver_mod
    from gcmiipy_tpu.parallel import gspmd, mesh as mesh_mod

    mesh = mesh_mod.make_mesh(n_dev)
    state = driver_mod.gen_model_state(geom, config)
    state = gspmd.shard_state(state, mesh)
    run = gspmd.make_sharded_run_fn(geom, config, steps, mesh)

    # donated state: rebuild per timing repetition via a closure copy
    return _timed(
        lambda: run(jax.tree.map(lambda x: x.copy(), state)), steps)


def _scan_of(step, steps):
    import functools

    import jax

    def body(c, _):
        return step(*c), None

    @functools.partial(jax.jit, donate_argnums=0)
    def run(s):
        out, _ = jax.lax.scan(body, s, None, length=steps)
        return out

    return lambda state: (lambda: run(tuple(x.copy() for x in state)))


def bench_fused_ring(geom, config, n_dev, steps):
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from gcmiipy_tpu.model import driver as driver_mod
    from gcmiipy_tpu.parallel import shard_step

    mesh = Mesh(jax.devices()[:n_dev], axis_names=("y",))
    interpret = jax.default_backend() != "tpu"
    step = shard_step.make_shard_step_fused(
        mesh, geom, config.dt, dtype=config.dtype, interpret=interpret)
    prog, _ = (driver_mod.gen_model_state(geom, config).prog, None)
    surf = NamedSharding(mesh, P("y", None))
    full = NamedSharding(mesh, P(None, "y", None))
    state = (jax.device_put(prog.p, surf),) + tuple(
        jax.device_put(x, full) for x in (prog.u, prog.v, prog.t, prog.q))
    return _timed(_scan_of(step, steps)(state), steps)


def bench_fused4_ring(geom, config, n_dev, steps):
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from gcmiipy_tpu.model import driver as driver_mod
    from gcmiipy_tpu.parallel import shard_step

    mesh = Mesh(jax.devices()[:n_dev], axis_names=("y",))
    interpret = jax.default_backend() != "tpu"
    step = shard_step.make_shard_step_fused4(
        mesh, geom, config.dt, dtype=config.dtype, interpret=interpret)
    prog = driver_mod.gen_model_state(geom, config).prog
    surf = NamedSharding(mesh, P("y", None))
    full = NamedSharding(mesh, P(None, "y", None))
    state = (jax.device_put(prog.p, surf),) + tuple(
        jax.device_put(x, full) for x in (prog.u, prog.v, prog.t, prog.q))
    return _timed(_scan_of(step, steps)(state), steps)


def bench_shard(geom, config, n_dev, steps):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gcmiipy_tpu.model import driver as driver_mod
    from gcmiipy_tpu.parallel import mesh as mesh_mod, shard_step

    mesh = mesh_mod.make_mesh(n_dev)
    step = shard_step.make_shard_step(mesh, geom, config.dt,
                                      dtype=config.dtype)
    prog = driver_mod.gen_model_state(geom, config).prog
    surf = NamedSharding(mesh, P("y", "x"))
    full = NamedSharding(mesh, P(None, "y", "x"))
    state = (jax.device_put(prog.p, surf),) + tuple(
        jax.device_put(x, full) for x in (prog.u, prog.v, prog.t, prog.q))
    return _timed(_scan_of(step, steps)(state), steps)


def bench_fused2d(geom, config, n_dev, steps):
    """Production 2D (lat x lon) path: pgf/rest kernels per shard +
    spectral-psum polar filter (round 5)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gcmiipy_tpu.model import driver as driver_mod
    from gcmiipy_tpu.parallel import mesh as mesh_mod, shard_step

    mesh = mesh_mod.make_mesh(n_dev)
    interpret = jax.default_backend() != "tpu"
    step = shard_step.make_shard_step_fused2d(
        mesh, geom, config.dt, dtype=config.dtype, interpret=interpret)
    prog = driver_mod.gen_model_state(geom, config).prog
    surf = NamedSharding(mesh, P("y", "x"))
    full = NamedSharding(mesh, P(None, "y", "x"))
    state = (jax.device_put(prog.p, surf),) + tuple(
        jax.device_put(x, full) for x in (prog.u, prog.v, prog.t, prog.q))
    return _timed(_scan_of(step, steps)(state), steps)


def bench_stream_ring(geom, config, n_dev, steps):
    """K-step streaming lat-ring: one launch + one K*PHJ-deep ppermute
    round per K steps (the v5 advantage carried multi-chip)."""
    import functools

    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from gcmiipy_tpu.model import driver as driver_mod
    from gcmiipy_tpu.model.config import ModelConfig
    from gcmiipy_tpu.ops.pallas_stencil import PHJ
    from gcmiipy_tpu.parallel import shard_step

    mesh = Mesh(jax.devices()[:n_dev], axis_names=("y",))
    interpret = jax.default_backend() != "tpu"
    Hl = geom.height // n_dev
    K = min(4, (Hl // PHJ) - (Hl // PHJ) % 2)
    if K < 2:
        raise ValueError(f"shard rows {Hl} < 2*PHJ; no streamed ring")
    if steps % K:
        raise ValueError(f"steps {steps} must divide the launch size {K}")
    adv = shard_step.make_shard_stream_ring(
        mesh, geom, config.dt, steps_per_launch=K, dtype=config.dtype,
        interpret=interpret, jit=False,
        filter_split_tau=ModelConfig().filter_split_tau)
    prog = driver_mod.gen_model_state(geom, config).prog
    surf = NamedSharding(mesh, P("y", None))
    full = NamedSharding(mesh, P(None, "y", None))
    state = (jax.device_put(prog.p, surf),) + tuple(
        jax.device_put(x, full) for x in (prog.u, prog.v, prog.t, prog.q))

    def body(c, _):
        return adv(*c), None

    @functools.partial(jax.jit, donate_argnums=0)
    def run(s):
        out, _ = jax.lax.scan(body, s, None, length=steps // K)
        return out

    return _timed(lambda: run(tuple(x.copy() for x in state)), steps)


PATHS = {"gspmd": bench_gspmd, "fused": bench_fused_ring,
         "fused4": bench_fused4_ring, "shard": bench_shard,
         "stream_ring": bench_stream_ring, "fused2d": bench_fused2d}


def run_scaling(height, width, layers, steps, device_counts, paths,
                dtype="float32"):
    import jax

    from gcmiipy_tpu.grid import geometry
    from gcmiipy_tpu.model.config import ModelConfig

    import numpy as np

    # dft: the decomposition-friendly filter form — the circulant-matmul
    # form makes GSPMD all-gather full rows (1.65x slower at 8 devices;
    # artifacts/gspmd_cliff_diagnosis.md); the explicit-halo paths build
    # their own filters and ignore this knob
    config = ModelConfig(height=height, width=width, layers=layers,
                         dtype=dtype, polar_filter="dft", stats=False)
    geom = geometry.gen_geometry(height, width, layers,
                                 sig_func=geometry.manabe_sig)
    geom = geom.astype(np.dtype(dtype))
    points = layers * height * width

    results = []
    for path in paths:
        base_pps = None
        for n in device_counts:
            try:
                sec = PATHS[path](geom, config, n, steps)
            except Exception as e:  # unsupported combo: record, keep going
                results.append({"path": path, "devices": n,
                                "error": f"{type(e).__name__}: {e}"})
                continue
            pps = points / sec
            if n == device_counts[0]:
                base_pps = pps
            eff = pps / (base_pps * n / device_counts[0])
            rec = {"path": path, "devices": n, "points_per_sec": pps,
                   "ms_per_step": sec * 1e3, "efficiency_vs_first": eff,
                   "platform": jax.default_backend()}
            results.append(rec)
            print(json.dumps(rec), flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--layers", type=int, default=5)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--paths", default="gspmd,fused4")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--out", default="scaling.json")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "native"],
                    help="cpu = force virtual CPU devices (default; works "
                         "anywhere); native = use the real devices jax "
                         "sees (a pod slice) — same harness, no edits")
    args = ap.parse_args()

    counts = [int(x) for x in args.devices.split(",")]

    if args.platform == "cpu":
        # must happen before the backend initializes (the axon
        # sitecustomize pre-imports jax but does not touch devices)
        _force_virtual_devices(max(counts))
    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) < max(counts):
        print(f"need {max(counts)} devices, have {len(jax.devices())}",
              file=sys.stderr)
        return 1

    results = run_scaling(args.height, args.width, args.layers, args.steps,
                          counts, args.paths.split(","), dtype=args.dtype)
    with open(args.out, "w") as fh:
        json.dump({"grid": [args.layers, args.height, args.width],
                   "steps": args.steps, "results": results}, fh, indent=1)
    print(f"# wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
