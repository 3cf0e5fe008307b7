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


HBM_BYTES_PER_SEC = {
    # peak HBM bandwidth per chip; v5e (the bench target) = 819 GB/s
    "v5e": 819e9,
    "v4": 1228e9,
    "v5p": 2765e9,
    "v6e": 1640e9,
}

MXU_BF16_FLOPS = {
    # peak bf16 matmul throughput per chip
    "v5e": 197e12,
    "v4": 275e12,
    "v5p": 459e12,
    "v6e": 918e12,
}


def step_roofline_seconds(height, width, layers, dtype="float32",
                          hbm_bps=HBM_BYTES_PER_SEC["v5e"]):
    """Lower bound on seconds/step from HBM bandwidth alone.

    A Matsuno step must at minimum read the 5 prognostic fields once and
    write them once (4 3D fields + surface pressure); every intermediate
    staying in VMEM is what the fused whole-step kernel achieves.  Compute
    (VPU transcendentals, filter MXU) is not in this bound.
    """
    itemsize = np.dtype(dtype).itemsize
    field_bytes = (4 * layers * height * width + height * width) * itemsize
    return 2 * field_bytes / hbm_bps


def filter_mxu_floor_seconds(geom, tile_j, filter_precision,
                             mxu_flops=MXU_BF16_FLOPS["v5e"],
                             split_tau=0.0):
    """Matmul-FLOP lower bound on the banded in-kernel polar filter.

    The stream/mega4 filter is matmul-FLOPs-bound (round-3 stage
    isolation: ~70% MXU utilization); this computes the exact per-step
    FLOP count of the banded chunk loop — 2 filter rounds x per-block
    trip counts x (fwd + inv matmul passes per chunk) — at bf16 peak.
    Split precisions cost 3 matmul passes per transform instead of 1
    (ops/pallas_stencil.py `correction`).
    """
    from gcmiipy_tpu.ops.pallas_stencil import (FILTER_CHUNK,
                                                block_chunk_counts,
                                                block_chunk_counts_split)
    W, L = geom.width, geom.layers
    nmm_fwd = 3 if filter_precision in ("high", "fwd_high") else 1
    nmm_inv = 3 if filter_precision == "high" else 1
    if filter_precision == "highest":
        nmm_fwd = nmm_inv = 2  # HIGHEST precision ~ 2x the default passes
    R = 2 * L * (tile_j + 8)                  # filter-batch rows per block
    per_chunk = 2.0 * R * W * FILTER_CHUNK    # FLOPs of ONE matmul pass
    if split_tau > 0 and filter_precision in ("high", "fwd_high"):
        pair = block_chunk_counts_split(geom.polar_mask, tile_j, 4,
                                        tile_j + 12, split_tau)
        nsp, ntot = int(pair[:, 0].sum()), int(pair[:, 1].sum())
        passes = nsp * (nmm_fwd + nmm_inv) + (ntot - nsp) * 2
    else:
        nch = block_chunk_counts(geom.polar_mask, tile_j, 4, tile_j + 12)
        passes = int(nch.sum()) * (nmm_fwd + nmm_inv)
    flops = 2 * passes * per_chunk
    return flops / mxu_flops


def stream_stage_probe(geom, dt, dtype="float32", filter_precision="high",
                       steps=100, K=20, filter_split_tau=0.0):
    """Measured stage decomposition of the stream kernel: the pure DMA
    pipeline (`_copy_body=True`, numerically meaningless) and the
    filterless body (`_copy_body='nofilter'`).  Returns (dma_floor_s,
    tendency_s) per step.  Compiles two extra kernel variants (cached).

    ``filter_split_tau`` only matters for keeping the probe's compiled
    variants cache-aligned with the production kernel; the probed bodies
    exclude the filter."""
    import jax
    import jax.numpy as jnp

    from gcmiipy_tpu.ops import pallas_stream as pstream

    out = []
    for body in (True, "nofilter"):
        multi = pstream.make_stream_kernel(
            geom, dt, K, dtype=dtype, filter_precision=filter_precision,
            filter_split_tau=filter_split_tau, _copy_body=body)
        H, W, L = geom.height, geom.width, geom.layers
        rng = np.random.default_rng(0)
        p = jnp.asarray(1e5 * (1 + 1e-3 * rng.standard_normal((H, W))),
                        dtype=dtype)
        u = jnp.asarray(0.5 * rng.standard_normal((L, H, W)), dtype=dtype)
        t = jnp.asarray(300.0 + rng.standard_normal((L, H, W)), dtype=dtype)
        q = jnp.asarray(1e-5 * np.ones((L, H, W)), dtype=dtype)
        packed = pstream.pack_state(p, u, u, t, q)
        S = jnp.stack([packed, jnp.zeros_like(packed)])

        @jax.jit
        def run(S):
            return jax.lax.scan(lambda c, _: (multi(c), None), S, None,
                                length=steps // K)[0]
        jax.block_until_ready(run(S))
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(run(S))
            times.append(time.perf_counter() - t0)
        out.append(min(times) / steps)
    return tuple(out)


def tpu_throughput(height, width, layers, steps, dtype="float32",
                   polar_filter="fft", backend="fused",
                   filter_precision="high", filter_split_tau=0.0):
    import jax
    import jax.numpy as jnp

    from gcmiipy_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

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

    from gcmiipy_tpu.ops.pallas_stencil import MEGA_MAX_WIDTH
    from gcmiipy_tpu.ops.pallas_stream import stream_grid_supported

    state = (p, u, v, t, q)
    if backend in ("fused3", "fused4", "fused4noband") \
            and width > MEGA_MAX_WIDTH:
        # the in-VMEM-filter mega kernels top out at MEGA_MAX_WIDTH; the
        # streaming kernel goes further (resident factors to W=2048,
        # HBM-streamed beyond on small-H grids)
        new = "stream" if stream_grid_supported(geom) else "fused"
        print(f"# width {width} > {MEGA_MAX_WIDTH}: benching the "
              f"'{new}' pipeline instead", file=sys.stderr)
        backend = new
    if backend.startswith("stream") and not stream_grid_supported(geom):
        print(f"# grid {height}x{width} outside the streaming envelope "
              "(8 | H >= 16, 128 | W <= 4096, any height); "
              "benching the v1 fused pipeline", file=sys.stderr)
        backend = "fused"
    if backend.startswith("stream"):
        # streaming multi-step kernel: K whole Matsuno steps per launch,
        # double-buffered manual DMA (ops/pallas_stream.py); the packed
        # ping-pong state buffer is carried across the whole scan
        from gcmiipy_tpu.ops import pallas_stream as pstream
        rest = backend[6:]
        pipeline = rest.startswith("pipe")   # 'streampipe[K]'
        if pipeline:
            rest = rest[4:]
        K = int(rest) if rest else 20
        if steps % K:
            raise ValueError(f"--steps {steps} must be a multiple of K={K}")
        multi = pstream.make_stream_kernel(
            geom, dt, K, dtype=dtype, filter_precision=filter_precision,
            pipeline=pipeline, filter_split_tau=filter_split_tau)
        packed = pstream.pack_state(*state)
        state = jnp.stack([packed, jnp.zeros_like(packed)])

        def body(carry, _):
            return multi(carry), None

        @jax.jit
        def run(state):
            out, _ = jax.lax.scan(body, state, None, length=steps // K)
            return out
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
        return points / best, best / steps, backend
    if backend in ("fused3", "fused4", "fused4noband"):
        # mega-kernel: polar filter lives inside the kernel (DFT matmuls)
        from gcmiipy_tpu.dynamics import fused
        from gcmiipy_tpu.ops import pallas_stencil as ps
        prec = ("default" if polar_filter == "dft_bf16"
                else filter_precision)
        if backend == "fused3":
            step_padded = fused.make_fused_matsuno_padded_v3(
                geom, dt, dtype=dtype, filter_precision=prec)
        else:
            step_padded = fused.make_fused_matsuno_padded_v4(
                geom, dt, dtype=dtype, filter_precision=prec,
                band_limit=(backend == "fused4"),
                filter_split_tau=filter_split_tau)
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
        dyn_step = driver_mod.make_dynamics_step(geom, config, filter_fn)

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
    return points / best, best / steps, backend


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
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--baseline-height", type=int, default=128)
    ap.add_argument("--baseline-width", type=int, default=256)
    def backend_arg(s):
        # 'stream[K]' / 'streampipe[K]' with any even K, plus the fixed set
        import re
        if s in ("fused", "fused2", "fused3", "fused4", "fused4noband",
                 "xla") or re.fullmatch(r"stream(pipe)?\d*", s):
            return s
        raise argparse.ArgumentTypeError(f"unknown backend {s!r}")

    ap.add_argument("--backend", default="stream", type=backend_arg,
                    help="fused|fused2|fused3|fused4|fused4noband|xla|"
                         "stream[K]|streampipe[K] (K = steps/launch)")
    ap.add_argument("--filter", default="dft",
                    choices=["fft", "dft", "dft_bf16", "matmul"])
    ap.add_argument("--precision", default="high",
                    choices=["highest", "high", "fwd_high", "default"])
    ap.add_argument("--chip", default="v5e", choices=sorted(HBM_BYTES_PER_SEC))
    ap.add_argument("--split-tau", type=float, default=None,
                    help="precision-selective banding threshold (chunks "
                         "with damping correction below it run 1-pass); "
                         "default = the ModelConfig production default")
    ap.add_argument("--no-probe", action="store_true",
                    help="skip the measured stream stage decomposition")
    args = ap.parse_args()
    if args.split_tau is None:
        from gcmiipy_tpu.model.config import ModelConfig
        args.split_tau = ModelConfig().filter_split_tau

    tpu_pps, sec_per_step, backend = tpu_throughput(
        args.height, args.width, args.layers, args.steps,
        polar_filter=args.filter, backend=args.backend,
        filter_precision=args.precision, filter_split_tau=args.split_tau)
    roof_s = step_roofline_seconds(args.height, args.width, args.layers,
                                   hbm_bps=HBM_BYTES_PER_SEC[args.chip])
    roof_frac = roof_s / sec_per_step
    print(f"# tpu: {tpu_pps:.3e} points/s ({sec_per_step*1e3:.2f} ms/step "
          f"at {args.layers}x{args.height}x{args.width}; HBM roofline "
          f"{roof_s*1e3:.2f} ms -> {100*roof_frac:.1f}% of roofline on "
          f"{args.chip})", file=sys.stderr)

    # --- compute-roofline model (round-3 verdict item 5): the stream step
    # is NOT HBM-bound (DMA is fully overlapped) — its floor is the
    # serial tendency-VPU + filter-MXU-FLOP chain.  Emit both stories.
    compute_model = None
    compute_frac = None
    if backend.startswith("stream"):
        import jax

        from gcmiipy_tpu.grid import geometry
        from gcmiipy_tpu.ops.pallas_stencil import (MEGA_MAX_WIDTH,
                                                    default_step_tile_j)
        geom_b = geometry.gen_geometry(args.height, args.width, args.layers,
                                       sig_func=geometry.manabe_sig)
        tj = ((16 if args.width <= 2048 and args.height <= 512 else 8)
              if args.width > MEGA_MAX_WIDTH
              else default_step_tile_j(args.width, args.layers))
        if tj == 64 and args.precision in ("high", "highest"):
            tj = 32
        # wide kernels disable selective banding (scoped-VMEM cost);
        # keep the floor model consistent
        model_tau = (0.0 if args.width > MEGA_MAX_WIDTH
                     else args.split_tau)
        filt_s = filter_mxu_floor_seconds(geom_b, tj, args.precision,
                                          MXU_BF16_FLOPS[args.chip],
                                          split_tau=model_tau)
        compute_model = {
            "filter_mxu_floor_ms": filt_s * 1e3,
            "mxu_peak_flops": MXU_BF16_FLOPS[args.chip],
            "tile_j": tj,
        }
        if not args.no_probe and jax.default_backend() == "tpu":
            try:
                dma_s, vpu_s = stream_stage_probe(
                    geom_b, 30.0, filter_precision=args.precision,
                    filter_split_tau=args.split_tau)
                compute_model["dma_floor_ms"] = dma_s * 1e3
                compute_model["tendency_ms"] = vpu_s * 1e3
                # round-5 attribution (closes the round-4 "unattributed
                # 0.28 ms"): the stage pair {tendency = the filterless
                # kernel, filter = full - tendency} accounts for the WHOLE
                # step (K-sweep 10..100 measured flat -> launch/boundary
                # overhead ~0); the filter's gap above its FLOP floor is
                # MXU utilization on the 128-wide banded chunk matmuls
                # (floor/actual below), not hidden overhead.
                filt_actual_s = sec_per_step - vpu_s
                compute_model["filter_actual_ms"] = filt_actual_s * 1e3
                compute_model["filter_mxu_utilization"] = (
                    filt_s / filt_actual_s if filt_actual_s > 0 else None)
                compute_model["stage_coverage_frac"] = (
                    (vpu_s + filt_actual_s) / sec_per_step)
                compute_frac = (vpu_s + filt_s) / sec_per_step
                print(f"# compute model: DMA floor {dma_s*1e3:.2f} ms "
                      f"(overlapped), tendency {vpu_s*1e3:.2f} ms + filter "
                      f"{filt_actual_s*1e3:.2f} ms measured (MXU-FLOP "
                      f"floor {filt_s*1e3:.2f} ms -> "
                      f"{100*filt_s/max(filt_actual_s,1e-9):.0f}% MXU "
                      f"util) -> stages cover "
                      f"{100*(vpu_s+filt_actual_s)/sec_per_step:.1f}% of "
                      f"the step; floor-model frac "
                      f"{100*compute_frac:.1f}%", file=sys.stderr)
            except Exception as e:  # pragma: no cover - probe best-effort
                print(f"# stage probe failed: {e}", file=sys.stderr)

    np_pps = numpy_baseline(args.baseline_height, args.baseline_width,
                            args.layers)
    print(f"# numpy baseline: {np_pps:.3e} points/s", file=sys.stderr)

    print(json.dumps({
        "metric": "matsuno_25d_gridpoint_steps_per_sec",
        "value": tpu_pps,
        "unit": "points/s",
        "vs_baseline": tpu_pps / np_pps,
        "ms_per_step": sec_per_step * 1e3,
        "roofline_frac": roof_frac,
        "compute_roofline_frac": compute_frac,
        "compute_model": compute_model,
        "roofline_chip": args.chip,
        "backend": backend,  # effective (wide grids fall back to v1)
        "filter_precision": args.precision,
    }))


if __name__ == "__main__":
    main()
