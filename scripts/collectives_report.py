"""Per-path collective breakdown of the decomposition paths.

Virtual-CPU wall-clock "efficiency" is meaningless (all devices share one
host's cores), but the COMMUNICATION STRUCTURE of each path is exactly
what the compiler will run on real ICI: this report compiles each
multi-chip path for one step (or one K-step launch) on an n-device mesh
and counts the collectives in the optimized HLO, with operand bytes.

Usage: python scripts/collectives_report.py [--devices 8] [--height 128]
           [--width 256] [--layers 5] [--out artifacts/collectives.json]
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COLLECTIVE_RE = re.compile(
    r"\b(collective-permute|all-gather|all-reduce|all-to-all|"
    r"reduce-scatter)\b")
SHAPE_RE = re.compile(r"(f32|f64|bf16|s32|u32)\[([0-9,]*)\]")


def _force_virtual_devices(n):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={n}"
                               ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


def count_collectives(hlo_text):
    """(op -> {count, bytes}) from optimized HLO text: every instruction
    line whose op is a collective, bytes = its result shape."""
    out = {}
    for line in hlo_text.splitlines():
        m = COLLECTIVE_RE.search(line)
        if not m or "=" not in line:
            continue
        op = m.group(1)
        # result shape = first shape on the line (lhs of =)
        sm = SHAPE_RE.search(line)
        nbytes = 0
        if sm:
            dt = {"f32": 4, "f64": 8, "bf16": 2, "s32": 4, "u32": 4}[
                sm.group(1)]
            dims = sm.group(2)
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes = n * dt
        rec = out.setdefault(op, {"count": 0, "bytes": 0})
        rec["count"] += 1
        rec["bytes"] += nbytes
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--layers", type=int, default=5)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    _force_virtual_devices(args.devices)
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from gcmiipy_tpu.grid import geometry
    from gcmiipy_tpu.model import driver as driver_mod
    from gcmiipy_tpu.model.config import ModelConfig
    from gcmiipy_tpu.parallel import gspmd, mesh as mesh_mod, shard_step

    H, W, L = args.height, args.width, args.layers
    config = ModelConfig(height=H, width=W, layers=L, dtype=args.dtype,
                         polar_filter="dft", stats=False)
    geom = geometry.gen_geometry(H, W, L, sig_func=geometry.manabe_sig)
    geom = geom.astype(np.dtype(args.dtype))
    n = args.devices
    mesh_y = Mesh(np.array(jax.devices()[:n]), ("y",))
    surf = NamedSharding(mesh_y, P("y", None))
    full = NamedSharding(mesh_y, P(None, "y", None))
    prog = driver_mod.gen_model_state(geom, config).prog
    state_y = (jax.device_put(prog.p, surf),) + tuple(
        jax.device_put(x, full) for x in (prog.u, prog.v, prog.t, prog.q))

    report = {"devices": n, "grid": f"{L}x{H}x{W}", "paths": {}}

    def record(name, compiled, steps=1, note=""):
        cc = count_collectives(compiled.as_text())
        per_step = {op: {"count": v["count"] / steps,
                         "bytes": v["bytes"] / steps}
                    for op, v in cc.items()}
        report["paths"][name] = {"per_step": per_step, "note": note}
        total = sum(v["count"] for v in per_step.values())
        tb = sum(v["bytes"] for v in per_step.values())
        print(f"{name:12s}: {total:g} collectives/step, "
              f"{tb / 1e6:.2f} MB/step  {note}")

    # GSPMD (2D mesh): compiler-inserted collectives
    mesh2 = mesh_mod.make_mesh(n)
    state2 = gspmd.shard_state(driver_mod.gen_model_state(geom, config),
                               mesh2)
    run = gspmd.make_sharded_run_fn(geom, config, 1, mesh2)
    record("gspmd", jax.jit(run).lower(state2).compile(), 1,
           f"2D mesh {mesh2.devices.shape}, compiler-chosen")

    # explicit-halo shard path (2D mesh, circulant filter all_gather)
    step_sh = shard_step.make_shard_step(mesh2, geom, config.dt,
                                         dtype=np.dtype(args.dtype))
    st2 = tuple(shard_step.shard_prognostics(prog, mesh2))
    record("shard", step_sh.lower(*st2).compile(), 1,
           "width-3 halos x 2 halves + per-half filter all_gather")

    # fused lat-ring (one ppermute round per HALF step)
    step_f = shard_step.make_shard_step_fused(
        mesh_y, geom, config.dt, dtype=np.dtype(args.dtype),
        interpret=True)
    record("fused", step_f.lower(*state_y).compile(), 1,
           "PHJ-row ring x 2 halves; filter in-kernel (zero comm)")

    # fused4 lat-ring (one ppermute round per STEP)
    step_f4 = shard_step.make_shard_step_fused4(
        mesh_y, geom, config.dt, dtype=np.dtype(args.dtype),
        interpret=True)
    record("fused4", step_f4.lower(*state_y).compile(), 1,
           "one PHJ-row ring per step")

    # fused 2D lat x lon (round-5): pgf/rest kernels per shard +
    # spectral-psum filter (interpret-mode kernels; the collectives are
    # the same ops the TPU build runs)
    step_2d = shard_step.make_shard_step_fused2d(
        mesh2, geom, config.dt, dtype=np.dtype(args.dtype),
        interpret=True)
    record("fused2d", step_2d.lower(*st2).compile(), 1,
           "depth-3 2D halos x 3 rounds + 2 spectral psums per step")

    # streamed ring (one K*PHJ-row ring per K steps)
    from gcmiipy_tpu.ops.pallas_stencil import PHJ
    Hl = H // n
    K = min(4, (Hl // PHJ) - (Hl // PHJ) % 2)
    adv = shard_step.make_shard_stream_ring(
        mesh_y, geom, config.dt, steps_per_launch=K,
        dtype=np.dtype(args.dtype), interpret=True)
    record("stream_ring", adv.lower(*state_y).compile(), K,
           f"one {K * PHJ}-row ring per K={K} steps (per-step numbers "
           "shown)")

    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"# wrote {args.out}")


if __name__ == "__main__":
    main()
