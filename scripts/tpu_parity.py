"""On-TPU kernel parity gate: fused Pallas pipelines vs the XLA core.

Interpret-mode kernel tests (tests/test_pallas_fused.py) cannot catch a
Mosaic LOWERING regression — this script runs the real compiled kernels on
TPU hardware and gates per-field RELATIVE agreement with the XLA core:

  1. v1 fused half-step kernel + XLA FFT filter vs the XLA core with the
     same filter.
  2. v4 whole-step mega kernel (banded in-VMEM DFT filter,
     filter_precision=highest so both sides use f32-exact matmuls) vs the
     XLA core with the exact-DFT filter.

Identical math cannot be BITWISE across the two compilers: Mosaic and XLA
lower ``x ** kappa`` through different transcendental approximations, so
f32 fields diverge at the ulp level and grow with steps.  Measured healthy
envelope on v5e (128x256x9, dt=30): step-1 per-field rel <= 1.2e-5,
step-50 <= 1.9e-4, p drift 0.11 Pa — the gates bound at ~8x that; a real
lowering regression produces O(1) garbage and trips them immediately.

Exit code 0 = all gates pass; 1 = violation (printed).  The verify lane
runs this (see .claude/skills/verify/SKILL.md).

Usage: python scripts/tpu_parity.py [--height 128 --width 256 --layers 9]
                                    [--steps 50]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _initial(geom, dtype, seed=0):
    import jax.numpy as jnp

    from gcmiipy_tpu import constants

    rng = np.random.default_rng(seed)
    L, H, W = geom.layers, geom.height, geom.width
    p = 1e5 * (1 + 1e-3 * rng.standard_normal((H, W)))
    u = 0.5 * rng.standard_normal((L, H, W))
    v = 0.5 * rng.standard_normal((L, H, W))
    tp = p[None] * np.asarray(geom.sig) + float(geom.ptop)
    t = (300.0 + rng.standard_normal((L, H, W))) \
        * (constants.P0 / tp) ** constants.kappa
    q = 1e-5 * (1 + 0.1 * rng.random((L, H, W)))
    return tuple(jnp.asarray(x, dtype) for x in (p, u, v, t, q))


def run_steps(step, state, n):
    import jax

    s = state
    for _ in range(n):
        s = step(*s)
    return tuple(np.asarray(x) for x in jax.block_until_ready(s))


def gate(name, ok, detail):
    status = "PASS" if ok else "FAIL"
    print(f"[{status}] {name}: {detail}", flush=True)
    return ok


def rel_diff(a_fields, b_fields):
    """Max per-field relative difference (field-scale normalized)."""
    return max(
        float(np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-30))
        for a, b in zip(a_fields, b_fields))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--layers", type=int, default=9)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--dt", type=float, default=30.0)
    ap.add_argument("--step1-rel-bound", type=float, default=1e-4,
                    help="per-field relative bound after 1 step")
    ap.add_argument("--rel-bound", type=float, default=2e-3,
                    help="per-field relative bound after --steps steps")
    ap.add_argument("--drift-bound-pa", type=float, default=0.5,
                    help="max |p_fused - p_xla| after --steps steps")
    ap.add_argument("--allow-cpu", action="store_true",
                    help="run in interpret mode off-TPU (smoke only; the "
                         "gate's purpose is catching Mosaic regressions)")
    ap.add_argument("--skip-wide", action="store_true",
                    help="skip the wide-grid (W=2048) stream gate")
    args = ap.parse_args()

    if args.allow_cpu:
        # the sandbox sitecustomize pre-imports jax on the axon platform;
        # env alone is too late (CLAUDE.md "Environment gotchas")
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.allow_cpu:
        jax.config.update("jax_platforms", "cpu")
    from gcmiipy_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu and not args.allow_cpu:
        print("FAIL: needs the TPU backend (or --allow-cpu for smoke)")
        return 1
    interpret = not on_tpu

    import jax.numpy as jnp

    from gcmiipy_tpu.dynamics import core25d, fused
    from gcmiipy_tpu.grid import geometry
    from gcmiipy_tpu.ops import polar_filter

    geom = geometry.gen_geometry(args.height, args.width, args.layers,
                                 sig_func=geometry.manabe_sig)
    geom = geom.astype(np.float32)
    state = _initial(geom, jnp.float32)
    all_ok = True

    # ---- gate 1: v1 fused + FFT filter vs the XLA core --------------------
    step_x = jax.jit(lambda *s: core25d.matsuno_timestep(
        *s, args.dt, geom, filter_fn=polar_filter.arakawa_1977))
    step_f = jax.jit(fused.make_fused_step(
        geom, args.dt, dtype=jnp.float32,
        filter_fn=polar_filter.arakawa_1977, pipeline="v1",
        interpret=interpret))
    x1 = run_steps(step_x, state, 1)
    f1 = run_steps(step_f, state, 1)
    rel = rel_diff(x1, f1)
    all_ok &= gate("v1 step-1 vs XLA", rel < args.step1_rel_bound,
                   f"max per-field rel = {rel:.3e} "
                   f"(bound {args.step1_rel_bound})")

    xN = run_steps(step_x, state, args.steps)
    fN = run_steps(step_f, state, args.steps)
    relN = rel_diff(xN, fN)
    pdrift = float(np.max(np.abs(xN[0] - fN[0])))
    all_ok &= gate(f"v1 {args.steps}-step vs XLA",
                   relN < args.rel_bound and pdrift < args.drift_bound_pa,
                   f"rel {relN:.3e} (bound {args.rel_bound}); p drift "
                   f"{pdrift:.4f} Pa (bound {args.drift_bound_pa})")

    # ---- gate 2: v4 mega kernel (banded DFT, highest) vs XLA + exact DFT --
    mats = polar_filter.build_dft_matrices(geom.width, dtype=np.float32)
    filt = lambda q, g: polar_filter.arakawa_1977_dft(
        q, g, mats, precision=jax.lax.Precision.HIGHEST)
    step_xd = jax.jit(lambda *s: core25d.matsuno_timestep(
        *s, args.dt, geom, filter_fn=filt))
    step_m = jax.jit(fused.make_fused_step(
        geom, args.dt, dtype=jnp.float32, pipeline="mega4",
        filter_precision="highest", interpret=interpret))
    x1 = run_steps(step_xd, state, 1)
    m1 = run_steps(step_m, state, 1)
    rel = rel_diff(x1, m1)
    all_ok &= gate("v4 step-1 vs XLA+DFT", rel < args.step1_rel_bound,
                   f"max per-field rel = {rel:.3e} "
                   f"(bound {args.step1_rel_bound})")

    xN = run_steps(step_xd, state, args.steps)
    mN = run_steps(step_m, state, args.steps)
    relN = rel_diff(xN, mN)
    pdrift = float(np.max(np.abs(xN[0] - mN[0])))
    all_ok &= gate(f"v4 {args.steps}-step vs XLA+DFT",
                   relN < args.rel_bound and pdrift < args.drift_bound_pa,
                   f"rel {relN:.3e} (bound {args.rel_bound}); p drift "
                   f"{pdrift:.4f} Pa (bound {args.drift_bound_pa})")

    # ---- gate 3: v5 streaming kernel vs the v4 kernel ---------------------
    # both run matsuno_block_body on identical block contents, so on
    # hardware the outputs are expected BITWISE equal — the gate bounds at
    # the step-1 tolerance to stay robust, but prints the actual rel
    from gcmiipy_tpu.ops import pallas_stream as pstream

    step_m_fh = jax.jit(fused.make_fused_step(
        geom, args.dt, dtype=jnp.float32, pipeline="mega4",
        filter_precision="high", interpret=interpret))
    K = max(2, args.steps - args.steps % 2)
    adv = jax.jit(pstream.make_stream_matsuno(
        geom, args.dt, steps_per_launch=K, interpret=interpret),
        static_argnums=5)
    sN = tuple(np.asarray(x) for x in jax.block_until_ready(
        adv(*state, K)))
    v4N = run_steps(step_m_fh, state, K)
    rel = rel_diff(v4N, sN)
    all_ok &= gate(f"stream {K}-step vs v4 (shared body)",
                   rel < args.step1_rel_bound,
                   f"max per-field rel = {rel:.3e} (expected ~0; bound "
                   f"{args.step1_rel_bound})")

    # ---- gate 3a: the PRODUCTION DEFAULT precision vs the EXACT filter ----
    # The round-3 hole this closes: gates 2-4 compare matched-precision
    # kernels (precision errors cancel) and gate 1 runs its filter in XLA,
    # so the in-kernel default filter_precision was never held to the
    # exact-filter standard — 'fwd_high' (1-pass DEFAULT inverse, bf16
    # operand truncation) survived two rounds while diverging 8e-2 from
    # the exact core within 2 steps.  This pins the shipped default
    # (ModelConfig().filter_precision) against the XLA FFT core.
    from gcmiipy_tpu.model.config import ModelConfig
    prod_prec = ModelConfig().filter_precision
    prod_tau = ModelConfig().filter_split_tau
    adv_prod = jax.jit(pstream.make_stream_matsuno(
        geom, args.dt, steps_per_launch=2,
        filter_precision=prod_prec, filter_split_tau=prod_tau,
        interpret=interpret), static_argnums=5)
    p2 = tuple(np.asarray(x) for x in jax.block_until_ready(
        adv_prod(*state, 2)))
    x2 = run_steps(step_x, state, 2)
    rel = rel_diff(x2, p2)
    # bound provenance: 'high' vs the exact FFT core measures 1.322e-4
    # after 2 steps on v5e (4 in-kernel filter applications at ~1.7e-5
    # each, step-amplified) — byte-identical when re-run on the round-3
    # code, i.e. the round-3 1e-4 bound was never validated on this gate
    # after its final kernel changes.  3e-4 = measured envelope x ~2.3.
    bound_3a = 3e-4
    all_ok &= gate(f"stream (default={prod_prec} tau={prod_tau}) "
                   "2-step vs XLA-FFT",
                   rel < bound_3a,
                   f"max per-field rel = {rel:.3e} (bound {bound_3a})")
    adv_prodN = jax.jit(pstream.make_stream_matsuno(
        geom, args.dt, steps_per_launch=K,
        filter_precision=prod_prec, filter_split_tau=prod_tau,
        interpret=interpret), static_argnums=5)
    pN = tuple(np.asarray(x) for x in jax.block_until_ready(
        adv_prodN(*state, K)))
    xN2 = run_steps(step_x, state, K)
    rel = rel_diff(xN2, pN)
    all_ok &= gate(f"stream (default={prod_prec} tau={prod_tau}) "
                   f"{K}-step vs XLA-FFT",
                   rel < args.rel_bound,
                   f"max per-field rel = {rel:.3e} (bound {args.rel_bound})")

    # ---- gate 3b: pair-interleaved stream pipeline vs plain stream --------
    # identical per-block stage graphs, only cross-block statement order
    # differs -> bitwise on hardware too; gates that Mosaic's scheduler /
    # layout choices under the interleaving do not perturb values
    adv_pipe = jax.jit(pstream.make_stream_matsuno(
        geom, args.dt, steps_per_launch=K, interpret=interpret,
        pipeline=True), static_argnums=5)
    sPN = tuple(np.asarray(x) for x in jax.block_until_ready(
        adv_pipe(*state, K)))
    rel = rel_diff(sN, sPN)
    all_ok &= gate(f"stream pipeline {K}-step vs plain stream",
                   rel == 0.0,
                   f"max per-field rel = {rel:.3e} (expected bitwise 0)")

    # ---- gate 4: lat-ring sharded fused4 on a 1-device 'y' mesh -----------
    # the shard_map + Mosaic combination executing UN-interpreted on
    # hardware (VERDICT round-2 item 3); vs the plain v4 pipeline this
    # isolates the ppermute-ring + per-shard-geometry plumbing
    from jax.sharding import Mesh

    from gcmiipy_tpu.parallel import shard_step

    mesh1 = Mesh(np.array(jax.devices()[:1]), ("y",))
    step_sh = shard_step.make_shard_step_fused4(
        mesh1, geom, args.dt, dtype=np.float32,
        filter_precision="high", interpret=interpret)
    sh1 = run_steps(step_sh, state, 1)
    m1 = run_steps(step_m_fh, state, 1)
    rel = rel_diff(m1, sh1)
    all_ok &= gate("sharded fused4 (1-dev 'y' mesh) step-1 vs v4",
                   rel < args.step1_rel_bound,
                   f"max per-field rel = {rel:.3e} (bound "
                   f"{args.step1_rel_bound})")
    shN = run_steps(step_sh, state, args.steps)
    v4n = run_steps(step_m_fh, state, args.steps)
    relN = rel_diff(v4n, shN)
    all_ok &= gate(f"sharded fused4 {args.steps}-step vs v4",
                   relN < args.rel_bound,
                   f"max per-field rel = {relN:.3e} (bound {args.rel_bound})")

    # ---- gate 4b: streamed lat-ring (1-dev 'y' mesh) vs plain stream ------
    # the ring variant compiles the stream kernel in geom_as_args mode
    # (per-shard row tables as runtime args) — a distinct Mosaic program
    # the interpret tests cannot certify; on one device the ring halo is
    # the periodic wrap itself, so outputs must match the plain kernel at
    # the v4-class tolerance (both share matsuno_block_body, but the ring
    # computes the K*PHJ halo rows redundantly -> not bitwise)
    from jax.sharding import Mesh as _Mesh

    from gcmiipy_tpu.parallel import shard_step as _ss

    mesh1 = _Mesh(np.array(jax.devices()[:1]), ("y",))
    ring = _ss.make_shard_stream_ring(
        mesh1, geom, args.dt, steps_per_launch=2, dtype=np.float32,
        interpret=interpret)
    rN = tuple(np.asarray(x) for x in jax.block_until_ready(
        ring(*state)))
    adv2 = jax.jit(pstream.make_stream_matsuno(
        geom, args.dt, steps_per_launch=2, interpret=interpret),
        static_argnums=5)
    s2 = tuple(np.asarray(x) for x in jax.block_until_ready(
        adv2(*state, 2)))
    rel = rel_diff(s2, rN)
    all_ok &= gate("stream ring (1-dev 'y' mesh) 2-step vs plain stream",
                   rel < args.step1_rel_bound,
                   f"max per-field rel = {rel:.3e} (bound "
                   f"{args.step1_rel_bound})")

    # ---- gate 6: FULL MODEL on stream vs mega4 at the same cadence --------
    # physics/drag run BETWEEN stream launches (round 4); with
    # physics_every == the launch size the numerics must match the
    # per-step mega4 path exactly (same block body, same cadence
    # arithmetic, identical XLA physics ops)
    from gcmiipy_tpu.model import driver as driver_mod
    from gcmiipy_tpu.model.config import ModelConfig as _MC

    phys_kw = dict(height=args.height, width=args.width,
                   layers=args.layers, dt=args.dt, dtype="float32",
                   physics=True, physics_every=2, convection=True,
                   drag_tau=86400.0, stats=False)
    outs = {}
    for be in ("stream", "mega4"):
        cfg_p = _MC(backend=be, stream_steps=2, **phys_kw)
        st0 = driver_mod.gen_model_state(geom, cfg_p)
        run_p = driver_mod.make_run_fn(geom, cfg_p, 4)
        out = run_p(st0)
        outs[be] = tuple(np.asarray(x) for x in jax.block_until_ready(
            out[0].prog))
    rel = rel_diff(outs["mega4"], outs["stream"])
    all_ok &= gate("full model (physics_every=2) stream vs mega4, 4 steps",
                   rel < args.step1_rel_bound,
                   f"max per-field rel = {rel:.3e} (bound "
                   f"{args.step1_rel_bound})")

    # ---- gate 6b: IN-KERNEL per-step physics (round 5) --------------------
    # at physics_every=1 the stream backend runs the grey-radiation/drag
    # epilogue INSIDE each in-kernel step (pallas_stream physics=...):
    # gate it against the per-step mega4 extras path (convection off —
    # in-kernel convection uses the fixed-sweep form)
    # start from the gate's random spun-up winds (same _initial as every
    # kernel gate): the driver IC has u = 0, and the in-kernel radiation
    # (static-ladder summation order) differs from the XLA form at f32
    # roundoff (~7e-6 on t) — on a zero-wind field the u-relative metric
    # measures only that heating noise (measured 0.29 "rel" on |u| ~ 1e-5
    # fields; p exact, gt 1.7e-7)
    from gcmiipy_tpu.model.state import PrognosticVars as _PV
    phys1_kw = dict(phys_kw, physics_every=1, convection=False)
    # host snapshot: make_run_fn DONATES its input, and jnp.asarray of a
    # live jax array aliases it — donating `state` would break the later
    # gates that reuse it
    state_np = tuple(np.asarray(x) for x in state)
    outs1 = {}
    for be in ("stream", "mega4"):
        cfg_p = _MC(backend=be, stream_steps=2, **phys1_kw)
        st0 = driver_mod.gen_model_state(geom, cfg_p)
        st0 = st0._replace(prog=_PV(*(jnp.asarray(x) for x in state_np)))
        run_p = driver_mod.make_run_fn(geom, cfg_p, 4)
        out = run_p(st0)
        outs1[be] = tuple(np.asarray(x) for x in jax.block_until_ready(
            out[0].prog))
    rel = rel_diff(outs1["mega4"], outs1["stream"])
    # bound: unlike gates 6/4b (identical physics code on both sides ->
    # bitwise), this compares TWO radiation implementations (in-kernel
    # static ladder vs XLA scans) whose f32 summation orders differ at
    # ~7e-6 on t per application; 4 dynamics steps amplify that to
    # ~1e-4 (measured 1.085e-4 healthy) — bound at 4e-4, the wide-gate
    # class
    pe1_bound = 4e-4
    all_ok &= gate("IN-KERNEL per-step physics (pe=1) stream vs mega4, "
                   "4 steps", rel < pe1_bound,
                   f"max per-field rel = {rel:.3e} (bound {pe1_bound}; "
                   "two radiation implementations, not a shared body)")

    # ---- gate 7: fused 2D lat x lon path (1x1 mesh) vs the XLA core -------
    # the round-5 ('y','x') production path compiles the pgf/rest kernels
    # in local_width/geom_as_args mode + the spectral-psum filter — a
    # Mosaic program the CPU tests run only in interpret mode; on one
    # device the halo exchanges are the periodic wrap, so outputs must
    # match the XLA core at the step-1 tolerance
    mesh11 = _Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("y", "x"))
    step_2d = _ss.make_shard_step_fused2d(
        mesh11, geom, args.dt, dtype=np.float32, interpret=interpret)
    d1 = tuple(np.asarray(x) for x in jax.block_until_ready(
        step_2d(*state)))
    rel = rel_diff(x1, d1)
    all_ok &= gate("fused2d (1x1 'y','x' mesh) step-1 vs XLA",
                   rel < args.step1_rel_bound,
                   f"max per-field rel = {rel:.3e} (bound "
                   f"{args.step1_rel_bound})")

    # ---- gate 5: wide-grid stream (split-bf16 DFT factors) vs XLA ---------
    # W > MEGA_MAX_WIDTH stores the banded factor matrices as hi/lo-split
    # bf16 pairs (forward AND inverse) and defaults tile_j=16
    # (pallas_stream.make_stream_kernel) — a layout the interpret-mode
    # tests can never exercise (`wide` is hardware-only).  This gate is
    # what caught the round-3 wide regression (unsplit bf16 inverse: rel
    # 0.68 — reproduced at 0.42 in pure XLA on CPU, i.e. a math bug, not
    # a lowering bug).  The 64x2048 grid is 16:1 anisotropic, so filter
    # residuals sit at near-CFL-critical wavenumbers; the gate runs at
    # dt=5 to measure filter fidelity rather than chaos amplification.
    wN = None
    if not args.skip_wide:
        wdt = 5.0
        wgeom = geometry.gen_geometry(64, 2048, 3,
                                      sig_func=geometry.manabe_sig)
        wgeom = wgeom.astype(np.float32)
        wstate = _initial(wgeom, jnp.float32)
        wstep_x = jax.jit(lambda *s: core25d.matsuno_timestep(
            *s, wdt, wgeom, filter_fn=polar_filter.arakawa_1977))
        Kw = 2
        wadv = jax.jit(pstream.make_stream_matsuno(
            wgeom, wdt, steps_per_launch=Kw, interpret=interpret),
            static_argnums=5)
        wN = tuple(np.asarray(x) for x in jax.block_until_ready(
            wadv(*wstate, Kw)))
        wxN = run_steps(wstep_x, wstate, Kw)
        rel = rel_diff(wxN, wN)
        all_ok &= gate(f"wide-grid stream (64x2048, split-bf16 factors) "
                       f"{Kw}-step vs XLA", rel < 4 * args.step1_rel_bound,
                       f"max per-field rel = {rel:.3e} (bound "
                       f"{4 * args.step1_rel_bound})")

        # ---- gate 5b: HBM-STREAMED factor matrices (W > 2048) ------------
        # past STREAM_RESIDENT_MAX_WIDTH the banded factors ride in HBM
        # and stream through two VMEM chunk slots with double-buffered
        # DMA inside the filter loop (round-4; matsuno_block_stages
        # body_streamed) — numerics are the same split-bf16 passes, so
        # the gate pins the DMA choreography at the wide tolerance, on a
        # W=4096 grid no resident layout can carry at all.
        w4geom = geometry.gen_geometry(32, 4096, 3,
                                       sig_func=geometry.manabe_sig)
        w4geom = w4geom.astype(np.float32)
        w4state = _initial(w4geom, jnp.float32)
        w4step_x = jax.jit(lambda *s: core25d.matsuno_timestep(
            *s, wdt, w4geom, filter_fn=polar_filter.arakawa_1977))
        w4adv = jax.jit(pstream.make_stream_matsuno(
            w4geom, wdt, steps_per_launch=Kw, interpret=interpret),
            static_argnums=5)
        w4N = tuple(np.asarray(x) for x in jax.block_until_ready(
            w4adv(*w4state, Kw)))
        w4xN = run_steps(w4step_x, w4state, Kw)
        rel = rel_diff(w4xN, w4N)
        all_ok &= gate(f"streamed-factor stream (32x4096, HBM factors) "
                       f"{Kw}-step vs XLA", rel < 4 * args.step1_rel_bound,
                       f"max per-field rel = {rel:.3e} (bound "
                       f"{4 * args.step1_rel_bound})")

        # ---- gate 5c: TALL wide grid (round 5: lon-tiled VPU stages +
        # HBM big-tables) — W=4096 above the old H<=64 envelope: the
        # tendency stages run in 1024-lane sub-tiles with a 128-lane wrap
        # halo and the H-scaled mask/heightmap tables DMA per block; both
        # are hardware-only code paths this gate pins vs XLA
        wtgeom = geometry.gen_geometry(128, 4096, 3,
                                       sig_func=geometry.manabe_sig)
        wtgeom = wtgeom.astype(np.float32)
        wtstate = _initial(wtgeom, jnp.float32)
        wtstep_x = jax.jit(lambda *s: core25d.matsuno_timestep(
            *s, wdt, wtgeom, filter_fn=polar_filter.arakawa_1977))
        wtadv = jax.jit(pstream.make_stream_matsuno(
            wtgeom, wdt, steps_per_launch=Kw, interpret=interpret),
            static_argnums=5)
        wtN = tuple(np.asarray(x) for x in jax.block_until_ready(
            wtadv(*wtstate, Kw)))
        wtxN = run_steps(wtstep_x, wtstate, Kw)
        rel = rel_diff(wtxN, wtN)
        all_ok &= gate(f"TALL wide stream (128x4096, lon-tiled + HBM "
                       f"tables) {Kw}-step vs XLA",
                       rel < 4 * args.step1_rel_bound,
                       f"max per-field rel = {rel:.3e} (bound "
                       f"{4 * args.step1_rel_bound})")
        wN = wtN

    finite = all(np.isfinite(a).all()
                 for a in list(mN) + list(fN) + list(sN) + list(shN)
                 + (list(wN) if wN is not None else []))
    all_ok &= gate("all outputs finite", finite, "")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
