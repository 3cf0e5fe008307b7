"""Benchmark: 2.5D primitive-equation Matsuno throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``value`` is grid-point-updates per second (L*H*W per Matsuno step) of the
jitted scan on the default backend (TPU).  ``vs_baseline`` is the speedup
over the reference-equivalent single-process NumPy implementation
(gcmiipy_tpu/oracle/numpy_ref.py — the reference publishes no numbers, so
its NumPy step measured on this host is the baseline proxy; BASELINE.md).

Usage: python bench.py [--height H --width W --layers L --steps N]
"""

import argparse
import json
import sys
import time

import numpy as np


def tpu_throughput(height, width, layers, steps, dtype="float32",
                   polar_filter="fft", backend="fused"):
    import jax
    import jax.numpy as jnp

    from gcmiipy_tpu.dynamics import core25d
    from gcmiipy_tpu.grid import geometry
    from gcmiipy_tpu.model import driver as driver_mod
    from gcmiipy_tpu.model.config import ModelConfig

    config = ModelConfig(height=height, width=width, layers=layers,
                         dtype=dtype, polar_filter=polar_filter,
                         backend=backend)
    geom = geometry.gen_geometry(height, width, layers,
                                 sig_func=geometry.manabe_sig)
    geom = geom.astype(np.dtype(dtype))
    filter_fn = driver_mod.make_filter_fn(config, geom)
    dyn_step = driver_mod.make_dynamics_step(geom, config, filter_fn)

    rng = np.random.default_rng(0)
    p = jnp.asarray(1e5 * (1 + 1e-3 * rng.standard_normal((height, width))),
                    dtype=dtype)
    shape3 = (layers, height, width)
    u = jnp.asarray(0.5 * rng.standard_normal(shape3), dtype=dtype)
    v = jnp.asarray(0.5 * rng.standard_normal(shape3), dtype=dtype)
    from gcmiipy_tpu import constants
    sig = np.asarray(geom.sig)
    tp = np.asarray(p)[None] * sig + float(geom.ptop)
    t = jnp.asarray((300.0 + rng.standard_normal(shape3))
                    * (constants.P0 / tp) ** constants.kappa, dtype=dtype)
    q = jnp.asarray(1e-5 * (1 + 0.1 * rng.random(shape3)), dtype=dtype)

    dt = 30.0  # small dt: stability irrelevant for throughput, avoids NaN traps

    state = (p, u, v, t, q)
    if backend in ("fused3", "fused4"):
        # mega-kernel: polar filter lives inside the kernel (DFT matmuls)
        from gcmiipy_tpu.dynamics import fused
        from gcmiipy_tpu.ops import pallas_stencil as ps
        make = (fused.make_fused_matsuno_padded_v4 if backend == "fused4"
                else fused.make_fused_matsuno_padded_v3)
        step_padded = make(
            geom, dt, dtype=dtype,
            filter_precision="default" if polar_filter == "dft_bf16"
            else "high")
        state = tuple(ps.pad_rows(x) for x in state)

        def body(carry, _):
            return step_padded(*carry), None
    elif backend in ("fused", "fused2"):
        # carry the padded state through the scan: no per-step pad passes
        from gcmiipy_tpu.dynamics import fused
        from gcmiipy_tpu.ops import pallas_stencil as ps
        make = (fused.make_fused_matsuno_padded_v2 if backend == "fused2"
                else fused.make_fused_matsuno_padded)
        step_padded = make(geom, dt, dtype=dtype, filter_fn=filter_fn)
        state = tuple(ps.pad_state(x) for x in state)

        def body(carry, _):
            return step_padded(*carry), None
    else:
        def body(carry, _):
            return dyn_step(*carry), None

    @jax.jit
    def run(state):
        out, _ = jax.lax.scan(body, state, None, length=steps)
        return out
    # warmup/compile
    out = run(state)
    jax.block_until_ready(out)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(state)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    best = min(times)
    points = layers * height * width * steps
    return points / best, best / steps


def numpy_baseline(height, width, layers, steps=2):
    from gcmiipy_tpu.grid import geometry
    from gcmiipy_tpu.oracle import numpy_ref

    geom = geometry.gen_geometry(height, width, layers,
                                 sig_func=geometry.manabe_sig)
    rng = np.random.default_rng(0)
    p = 1e5 * (1 + 1e-3 * rng.standard_normal((height, width)))
    shape3 = (layers, height, width)
    u = 0.5 * rng.standard_normal(shape3)
    v = 0.5 * rng.standard_normal(shape3)
    from gcmiipy_tpu import constants
    tp = p[None] * np.asarray(geom.sig) + float(geom.ptop)
    t = (300.0 + rng.standard_normal(shape3)) * (constants.P0 / tp) ** constants.kappa
    q = 1e-5 * (1 + 0.1 * rng.random(shape3))

    state = (p, u, v, t, q)
    state = numpy_ref.matsuno_timestep_np(*state, 30.0, geom)  # warm caches
    t0 = time.perf_counter()
    for _ in range(steps):
        state = numpy_ref.matsuno_timestep_np(*state, 30.0, geom)
    elapsed = time.perf_counter() - t0
    points = layers * height * width * steps
    return points / elapsed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=9)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--baseline-height", type=int, default=128)
    ap.add_argument("--baseline-width", type=int, default=256)
    ap.add_argument("--backend", default="fused",
                    choices=["fused", "fused2", "fused3", "fused4", "xla"])
    ap.add_argument("--filter", default="fft",
                    choices=["fft", "dft", "dft_bf16", "matmul"])
    args = ap.parse_args()

    tpu_pps, sec_per_step = tpu_throughput(
        args.height, args.width, args.layers, args.steps,
        polar_filter=args.filter, backend=args.backend)
    print(f"# tpu: {tpu_pps:.3e} points/s ({sec_per_step*1e3:.2f} ms/step "
          f"at {args.layers}x{args.height}x{args.width})", file=sys.stderr)

    np_pps = numpy_baseline(args.baseline_height, args.baseline_width,
                            args.layers)
    print(f"# numpy baseline: {np_pps:.3e} points/s", file=sys.stderr)

    print(json.dumps({
        "metric": "matsuno_25d_gridpoint_steps_per_sec",
        "value": tpu_pps,
        "unit": "points/s",
        "vs_baseline": tpu_pps / np_pps,
    }))


if __name__ == "__main__":
    main()
