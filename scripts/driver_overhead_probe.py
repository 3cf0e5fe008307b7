"""Probe: where do the driver-path stream milliseconds go?

bench.py's raw kernel scan measures ~2.13 ms/step at the flagship grid;
physics_bench's driver path (guard/stats off, no extras) measured ~2.32.
This bisects the gap: (a) raw packed scan, (b) packed scan + the
ModelState-shaped carry (ground/utc/step riding along), (c) the actual
_make_stream_run_fn product.

Usage: python scripts/driver_overhead_probe.py [--steps 200]
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
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--k", type=int, default=20)
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gcmiipy_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from gcmiipy_tpu.grid import geometry
    from gcmiipy_tpu.model import driver as drv
    from gcmiipy_tpu.model.config import ModelConfig
    from gcmiipy_tpu.ops import pallas_stream as pstream

    H, W, L = args.height, args.width, args.layers
    K, steps = args.k, args.steps
    cfg = ModelConfig(height=H, width=W, layers=L, backend="stream",
                      stream_steps=K, stats=False, guard=False, dt=30.0)
    geom = geometry.gen_geometry(H, W, L,
                                 sig_func=geometry.manabe_sig
                                 ).astype(np.float32)
    state = drv.gen_model_state(geom, cfg)
    multi = pstream.make_stream_kernel(geom, 30.0, K,
                                       filter_split_tau=cfg.filter_split_tau)

    def timed(fn, arg_fn):
        out = fn(arg_fn())
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            a = arg_fn()
            jax.block_until_ready(a)
            t0 = time.perf_counter()
            out = fn(a)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return min(ts) / steps * 1e3

    packed = pstream.pack_state(*(x.astype(jnp.float32)
                                  for x in state.prog))
    S0 = jnp.stack([packed, jnp.zeros_like(packed)])

    @functools.partial(jax.jit, donate_argnums=0)
    def raw(S):
        return jax.lax.scan(lambda c, _: (multi(c), None), S, None,
                            length=steps // K)[0]
    print(f"raw packed scan        : "
          f"{timed(raw, lambda: jnp.copy(S0)):7.3f} ms/step", flush=True)

    @functools.partial(jax.jit, donate_argnums=0)
    def with_carry(carry):
        def body(c, _):
            S, g, utc, step = c
            return (multi(S), g, utc + K * 30.0, step + K), None
        return jax.lax.scan(body, carry, None, length=steps // K)[0]

    def carry0():
        # fresh copies every call: the donated buffers are consumed
        ground = type(state.ground)(*(jnp.copy(x) for x in state.ground))
        return (jnp.copy(S0), ground,
                jnp.asarray(0.0, jnp.float32), jnp.asarray(0, jnp.int32))
    print(f"+ ModelState carry     : "
          f"{timed(with_carry, carry0):7.3f} ms/step", flush=True)

    run = drv.make_run_fn(geom, cfg, steps)
    print(f"driver make_run_fn     : "
          f"{timed(run, lambda: drv.gen_model_state(geom, cfg)):7.3f} "
          "ms/step", flush=True)


if __name__ == "__main__":
    main()
