"""Can Mosaic overlap independent MXU matmuls with VPU elementwise work?

Decides whether restructuring the streaming kernel for MXU/VPU software
pipelining can pay: the step is ~1.15 ms VPU tendency work + ~0.80 ms
filter matmuls run back-to-back (scripts/stream_probe.py), so perfect
overlap would cap the step at max(VPU, MXU) instead of the sum.

Three kernels, same fori_loop trip count.  Each trip carries a live
(VR, W) tensor ``v``; the matmul consumes the CURRENT ``v`` (so it cannot
be hoisted out of the loop) while the VPU chain independently computes the
next ``v`` — exactly the data-dependence shape a pipelined step kernel
would have (filter matmuls of stage N co-scheduled with tendency VPU ops
of stage N+1).

  mxu   — matmul(v, M) per trip (+ one cheap v update to keep v live).
  vpu   — the elementwise chain only.
  both  — the SAME matmul AND the SAME chain, data-independent in-trip.

overlap ratio = (t_mxu + t_vpu - t_both) / min(t_mxu, t_vpu):
~1 -> full co-scheduling (both ~ max); ~0 -> serialized (both ~ sum).

Usage: python scripts/overlap_probe.py [--trips 16 --iters 200]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--cols", type=int, default=256)   # one C|S chunk pair
    ap.add_argument("--vrows", type=int, default=720)  # L * tj_in
    ap.add_argument("--chain", type=int, default=5)    # VPU passes per trip
    ap.add_argument("--trips", type=int, default=16)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gcmiipy_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    W, C, VR = args.width, args.cols, args.vrows
    trips = args.trips

    def vpu_chain(v):
        for _ in range(args.chain):
            v = v * 1.0001 + 0.1
            v = jnp.abs(v) * 0.9999 - 0.05
        return v

    def kernel(mode, m_ref, v_ref, yx_ref, yv_ref):
        def body(c, carry):
            acc, v = carry
            if mode in ("mxu", "both"):
                acc = acc + jnp.matmul(
                    v, m_ref[:],
                    precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32)
            if mode in ("vpu", "both"):
                v = vpu_chain(v)
            else:
                v = v * 1.0000001  # keep v live so nothing hoists
            return acc, v

        acc0 = jnp.zeros((VR, C), jnp.float32)
        acc, v = jax.lax.fori_loop(0, trips, body, (acc0, v_ref[:]))
        yx_ref[:] = acc
        yv_ref[:] = v

    rng = np.random.default_rng(0)
    M = jnp.asarray(rng.standard_normal((W, C)) * 0.01, jnp.float32)
    V = jnp.asarray(rng.standard_normal((VR, W)), jnp.float32)

    times = {}
    for mode in ("mxu", "vpu", "both"):
        call = pl.pallas_call(
            functools.partial(kernel, mode),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((VR, C), jnp.float32),
                       jax.ShapeDtypeStruct((VR, W), jnp.float32)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        f = jax.jit(lambda M, V, call=call: call(M, V))
        out = f(M, V)
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = f(M, V)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        times[mode] = min(ts) / args.iters * 1e3
        print(f"{mode:5s}: {times[mode]:7.4f} ms/call", flush=True)

    t_m, t_v, t_b = times["mxu"], times["vpu"], times["both"]
    overlap = (t_m + t_v - t_b) / max(min(t_m, t_v), 1e-9)
    print(f"overlap ratio: {overlap:.2f}  "
          f"(1 = perfect co-scheduling, 0 = fully serialized)")


if __name__ == "__main__":
    main()
