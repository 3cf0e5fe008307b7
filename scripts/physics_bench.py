"""Full-model production step cost: dynamics kernel + column physics.

bench.py times the pure-dynamics hot loop; production runs add the grey
radiation, optional convective adjustment and surface drag
(reference ``no_limits_2_5d.py:79-104``, physics enabled).  This measures
that full step.  Under ``--backend stream`` the extras run BETWEEN
multi-step launches at the ``--physics-every`` cadence (dt_eff scaled;
the GCM-II radiation-subcycling practice — GCM-II called radiation every
5 model hours); per-step backends apply them via lax.cond at the same
cadence.

Usage: python scripts/physics_bench.py [--height 512 --width 1024
                                        --layers 9 --steps 200]
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
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--dt", type=float, default=30.0)
    ap.add_argument("--backend", default="mega4")
    ap.add_argument("--no-convection", action="store_true",
                    help="radiation+drag only (isolates the convection "
                         "share)")
    ap.add_argument("--physics-every", type=int, default=1,
                    help="physics cadence (dt_eff = N*dt); under the "
                         "stream backend extras run between launches")
    args = ap.parse_args()

    import jax

    from gcmiipy_tpu.grid import geometry
    from gcmiipy_tpu.model.config import ModelConfig
    from gcmiipy_tpu.model.driver import gen_model_state, make_run_fn
    from gcmiipy_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    geom = geometry.gen_geometry(args.height, args.width, args.layers,
                                 sig_func=geometry.manabe_sig)
    geom = geom.astype(np.float32)

    results = {}
    for name, cfg in [
        ("dynamics", ModelConfig(backend=args.backend, dt=args.dt,
                                 stats=False, guard=False)),
        ("physics", ModelConfig(backend=args.backend, dt=args.dt,
                                physics=True,
                                convection=not args.no_convection,
                                drag_tau=86400.0, stats=False,
                                guard=False,
                                physics_every=args.physics_every)),
    ]:
        state = gen_model_state(geom, cfg)
        run = make_run_fn(geom, cfg, timesteps=args.steps)
        out = run(state)
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            state = gen_model_state(geom, cfg)
            jax.block_until_ready(state)   # keep IC setup out of the timing
            t0 = time.perf_counter()
            out = run(state)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / args.steps * 1e3
        results[name] = ms
        print(f"{name:9s}: {ms:7.3f} ms/step "
              f"({args.backend}, {args.layers}x{args.height}x{args.width})",
              flush=True)
    ov = results["physics"] - results["dynamics"]
    print(f"physics overhead: {ov:+.3f} ms/step "
          f"({ov / results['dynamics'] * 100:.0f}% of the dynamics step)")


if __name__ == "__main__":
    main()
