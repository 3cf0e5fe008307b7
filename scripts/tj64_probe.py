"""Probe: can tile_j=64 compile under filter_precision='high'?

Round-3 finding: the split-inverse transients overflow scoped VMEM at
tile 64 (tile 32 is the forced default, ~0.2 ms/step slower tendency).
Round-4 lever: HBM-streamed factor matrices (_stream_factors=True) free
the resident factor VMEM and shrink the filter loop's working set —
this probe measures whether that unlocks tile 64, and at what speed.

Each variant prints ms/step or the compile failure, one line each.
Usage: python scripts/tj64_probe.py [--steps 100] [--k 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=9)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--k", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gcmiipy_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from gcmiipy_tpu.grid import geometry
    from gcmiipy_tpu.ops import pallas_stream as pstream

    H, W, L = args.height, args.width, args.layers
    geom = geometry.gen_geometry(H, W, L, sig_func=geometry.manabe_sig)
    geom = geom.astype(np.float32)
    rng = np.random.default_rng(0)
    p = jnp.asarray(1e5 * (1 + 1e-3 * rng.standard_normal((H, W))),
                    jnp.float32)
    u = jnp.asarray(0.5 * rng.standard_normal((L, H, W)), jnp.float32)
    t = jnp.asarray(300.0 + rng.standard_normal((L, H, W)), jnp.float32)
    q = jnp.asarray(1e-5 * np.ones((L, H, W)), jnp.float32)
    packed = pstream.pack_state(p, u, u, t, q)
    S0 = jnp.stack([packed, jnp.zeros_like(packed)])

    variants = [
        ("tj64 high resident", dict(tile_j=64, filter_precision="high")),
        ("tj64 high streamed-factors",
         dict(tile_j=64, filter_precision="high", _stream_factors=True)),
        ("tj64 high streamed tau=0.1",
         dict(tile_j=64, filter_precision="high", _stream_factors=True,
              filter_split_tau=0.1)),
        ("tj32 high streamed-factors (control)",
         dict(tile_j=32, filter_precision="high", _stream_factors=True)),
        ("tj64 high tau=0.1 resident",
         dict(tile_j=64, filter_precision="high", filter_split_tau=0.1)),
    ]
    for name, kw in variants:
        try:
            multi = pstream.make_stream_kernel(geom, 30.0, args.k, **kw)

            @jax.jit
            def run(S):
                return jax.lax.scan(lambda c, _: (multi(c), None), S, None,
                                    length=args.steps // args.k)[0]
            jax.block_until_ready(run(S0))
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                jax.block_until_ready(run(S0))
                ts.append(time.perf_counter() - t0)
            print(f"{name:36s}: {min(ts) / args.steps * 1e3:7.3f} ms/step",
                  flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:140]
            print(f"{name:36s}: FAILED {type(e).__name__}: {msg}",
                  flush=True)


if __name__ == "__main__":
    main()
