"""Component timing probe for the mega-kernel step (TPU).

Times, per Matsuno step at the bench grid:
  kernel-only      : 2x mega kernel call, no halo refresh (numerically wrong,
                     perf-indicative)
  refresh-only     : 2x refresh_halo on 5 padded fields
  full             : the real v3 step
  tile_j variants  : kernel-only at tile_j in {16, 32, 64}

Usage: python scripts/perf_probe.py [--height 512 --width 1024 --layers 9]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(run, state, steps):
    import jax
    out = run(state)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(state)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) / steps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=9)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--precision", default="default")
    ap.add_argument("--v4", action="store_true",
                    help="probe the v4 whole-step kernel instead of v3: "
                         "full banded step, zero-chunk filter (same "
                         "compiled kernel, nch data set to 0 — isolates "
                         "the filter MXU share with no recompile), and "
                         "tile_j variants")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gcmiipy_tpu.dynamics import fused
    from gcmiipy_tpu.grid import geometry
    from gcmiipy_tpu.ops import pallas_stencil as ps
    from gcmiipy_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    H, W, L = args.height, args.width, args.layers
    geom = geometry.gen_geometry(H, W, L, sig_func=geometry.manabe_sig)
    geom = geom.astype(np.float32)

    rng = np.random.default_rng(0)
    p = jnp.asarray(1e5 * (1 + 1e-3 * rng.standard_normal((H, W))), jnp.float32)
    u = jnp.asarray(0.5 * rng.standard_normal((L, H, W)), jnp.float32)
    v = jnp.asarray(0.5 * rng.standard_normal((L, H, W)), jnp.float32)
    from gcmiipy_tpu import constants
    tp = np.asarray(p)[None] * np.asarray(geom.sig) + float(geom.ptop)
    t = jnp.asarray((300.0 + rng.standard_normal((L, H, W)))
                    * (constants.P0 / tp) ** constants.kappa, jnp.float32)
    q = jnp.asarray(1e-5 * (1 + 0.1 * rng.random((L, H, W))), jnp.float32)
    state = tuple(ps.pad_rows(x) for x in (p, u, v, t, q))

    def scan_of(step):
        def body(c, _):
            return step(*c), None

        @jax.jit
        def run(s):
            out, _ = jax.lax.scan(body, s, None, length=args.steps)
            return out
        return run

    if args.v4:
        from gcmiipy_tpu.dynamics import core25d as c25
        from gcmiipy_tpu.ops import polar_filter as pf

        orig_chunks = pf.band_chunk_counts
        orig_rest, orig_pgf = c25.half_timestep_rest, c25.pgf_forces

        def v4_step(prec, tile_j=32, zero_chunks=False):
            if zero_chunks:
                pf.band_chunk_counts = lambda mask, chunk=128: np.zeros(
                    np.asarray(mask).shape[0], np.int32)
            try:
                return fused.make_fused_matsuno_padded_v4(
                    geom, 30.0, filter_precision=prec, tile_j=tile_j)
            finally:
                pf.band_chunk_counts = orig_chunks

        # stage isolation: numerically wrong, perf-indicative only.  The
        # patches must stay active through the first timed run (the kernel
        # body traces lazily), so restoration happens in the probe loop.
        def patch(pgf_off, rest_off):
            if pgf_off:
                c25.pgf_forces = lambda sp, su, st, geom: (su, st, st)
            if rest_off:
                c25.half_timestep_rest = (
                    lambda p, u, v, t, q, sp, su, sv, st, sq, spu, dt,
                    geom, coriolis=False: (p + spu[0], u + spu, v, t, q))

        for name, mk in [
            ("v4 banded tj=64", lambda: v4_step("fwd_high", tile_j=64)),
            ("v4 banded fwd_high", lambda: v4_step("fwd_high")),
            ("v4 noop body", lambda: (patch(True, True),
                                      v4_step("default",
                                              zero_chunks=True))[1]),
            ("v4 pgf-only", lambda: (patch(False, True),
                                     v4_step("default",
                                             zero_chunks=True))[1]),
            ("v4 rest-only", lambda: (patch(True, False),
                                      v4_step("default",
                                              zero_chunks=True))[1]),
            ("v4 zero-chunk filt", lambda: v4_step("fwd_high",
                                                   zero_chunks=True)),
            ("v4 banded default", lambda: v4_step("default")),
        ]:
            try:
                ms = timed(scan_of(mk()), state, args.steps)
                print(f"{name:20s}: {ms:.2f} ms/step", flush=True)
            except Exception as e:
                print(f"{name:20s}: failed: {type(e).__name__}: {e}",
                      flush=True)
            finally:
                c25.half_timestep_rest, c25.pgf_forces = orig_rest, orig_pgf
        return

    # full v3
    step_full = fused.make_fused_matsuno_padded_v3(
        geom, 30.0, filter_precision=args.precision)
    print("full v3          :", f"{timed(scan_of(step_full), state, args.steps):.2f} ms/step", flush=True)

    # stage isolation: noop body (DMA+launch), pgf+filter only, full
    from gcmiipy_tpu.dynamics import core25d as c25

    orig_rest, orig_pgf = c25.half_timestep_rest, c25.pgf_forces

    def run_variant(name, patch_pgf, patch_rest):
        c25.pgf_forces = (
            (lambda sp, su, st, geom: (su, st, st)) if patch_pgf
            else orig_pgf)
        c25.half_timestep_rest = (
            (lambda p, u, v, t, q, sp, su, sv, st, sq, spu, dt, geom,
             coriolis=False: (p + spu[0], u + spu, v, t, q)) if patch_rest
            else orig_rest)
        try:
            half = ps.make_mega_kernel_padded(
                geom, 30.0, tile_j=32, filter_precision=args.precision)

            def step_k(*s, _half=half):
                a = _half(s, s)
                return _half(s, a)
            ms = timed(scan_of(step_k), state, args.steps)
            print(f"{name:17s}: {ms:.2f} ms/step", flush=True)
        except Exception as e:
            print(f"{name:17s}: failed: {type(e).__name__}: {e}", flush=True)
        finally:
            c25.half_timestep_rest, c25.pgf_forces = orig_rest, orig_pgf

    run_variant("noop body (DMA)", True, True)
    run_variant("pgf+filter only", False, True)

    # kernel-only (no refresh, no wall)
    for tj in (16, 32, 64):
        try:
            half = ps.make_mega_kernel_padded(
                geom, 30.0, tile_j=tj, filter_precision=args.precision)
        except Exception as e:
            print(f"kernel-only tj={tj}: build failed: {e}", flush=True)
            continue

        def step_k(*s, _half=half):
            a = _half(s, s)
            return _half(s, a)
        try:
            ms = timed(scan_of(step_k), state, args.steps)
            print(f"kernel-only tj={tj}:", f"{ms:.2f} ms/step", flush=True)
        except Exception as e:
            print(f"kernel-only tj={tj}: run failed: {type(e).__name__}", flush=True)

    # refresh-only
    def step_r(*s):
        s = tuple(ps.refresh_rows(x) for x in s)
        return tuple(ps.refresh_rows(x) for x in s)
    print("refresh-only x2  :", f"{timed(scan_of(step_r), state, args.steps):.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
