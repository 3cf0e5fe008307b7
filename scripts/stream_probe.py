"""Stage isolation for the streaming (v5) kernel on TPU.

Per-variant ms/step at the bench grid:

  copy      — DMA-pipeline floor: the block body is replaced by a crop of
              the input window, so the time is launch + the double-buffered
              HBM streaming alone (numerically meaningless output).
  nofilter  — real body, banded-filter trip counts forced to 0: tendency
              physics VPU time without the filter MXU passes.
  full      — the production kernel.

Because the DMA is explicitly overlapped, full ~ max(copy, compute) +
exposed tails: (full - nofilter) isolates the filter MXU share, and
(nofilter - copy) the VPU share that the DMA cannot hide.

Usage: python scripts/stream_probe.py [--height 512 --width 1024
                                       --layers 9 --steps 100 --k 20]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=9)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--tile-j", type=int, nargs="*", default=[32, 64])
    ap.add_argument("--extra", action="store_true",
                    help="also probe unbanded + default-precision filters")
    ap.add_argument("--pipeline", action="store_true",
                    help="also probe the pair-interleaved pipeline variant")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gcmiipy_tpu.grid import geometry
    from gcmiipy_tpu.ops import pallas_stream as pstream
    from gcmiipy_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    H, W, L = args.height, args.width, args.layers
    geom = geometry.gen_geometry(H, W, L, sig_func=geometry.manabe_sig)
    geom = geom.astype(np.float32)
    rng = np.random.default_rng(0)
    p = jnp.asarray(1e5 * (1 + 1e-3 * rng.standard_normal((H, W))),
                    jnp.float32)
    u = jnp.asarray(0.5 * rng.standard_normal((L, H, W)), jnp.float32)
    v = jnp.asarray(0.5 * rng.standard_normal((L, H, W)), jnp.float32)
    from gcmiipy_tpu import constants
    tp = np.asarray(p)[None] * np.asarray(geom.sig) + float(geom.ptop)
    t = jnp.asarray((300.0 + rng.standard_normal((L, H, W)))
                    * (constants.P0 / tp) ** constants.kappa, jnp.float32)
    q = jnp.asarray(1e-5 * (1 + 0.1 * rng.random((L, H, W))), jnp.float32)

    packed = pstream.pack_state(p, u, v, t, q)
    S0 = jnp.stack([packed, jnp.zeros_like(packed)])
    K, steps = args.k, args.steps
    assert steps % K == 0

    variants = [("copy", dict(_copy_body=True)),
                ("nofilter", dict(_copy_body="nofilter")),
                ("full", dict())]
    if args.extra:
        # filter-cost scaling probes: unbanded forces every block to all
        # spectral chunks (4 at W=1024 vs 2.5 banded average); fdefault
        # runs the 1-pass bf16 filter (research precision, 2 matmul units
        # vs fwd_high's 4).  If filter MXU time is fully serialized with
        # the VPU body, full-to-unbanded deltas scale with chunk count.
        variants += [("unbanded", dict(band_limit=False)),
                     ("fdefault", dict(filter_precision="default"))]
    if args.pipeline:
        # pair-interleaved block loop: filter MXU co-scheduled with the
        # other block's VPU stages (bitwise-equal numerics)
        variants += [("pipeline", dict(pipeline=True))]

    for tj in args.tile_j:
        for name, kw in variants:
            try:
                multi = pstream.make_stream_kernel(
                    geom, 30.0, K, tile_j=tj, **kw)

                @jax.jit
                def run(S):
                    def body(c, _):
                        return multi(c), None
                    S, _ = jax.lax.scan(body, S, None, length=steps // K)
                    return S

                out = run(S0)
                jax.block_until_ready(out)
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    out = run(S0)
                    jax.block_until_ready(out)
                    ts.append(time.perf_counter() - t0)
                print(f"tile_j={tj:3d} {name:9s}: "
                      f"{min(ts) / steps * 1e3:7.3f} ms/step", flush=True)
            except Exception as e:  # noqa: BLE001 — probe keeps going
                print(f"tile_j={tj:3d} {name:9s}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
