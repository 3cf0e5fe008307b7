"""v5: the streaming multi-step kernel — K whole Matsuno steps per launch.

Why it exists: the v4 whole-step kernel is bound by a ~1.9 ms DMA/launch
floor (measured: a noop-body v4 kernel costs 1.92 ms at 9x512x1024 vs a
0.19 ms HBM read+write-once roofline).  The floor is NOT bandwidth — it is
the grid pipeline's Element-indexed block copies running unpipelined, plus
one launch per step.  This kernel removes both:

* ONE ``pallas_call`` executes ``steps`` complete Matsuno steps.  The
  5-field state rides in HBM as a single packed ``(2, 1+4L, H, W)`` array
  (plane 0 = p, then u, v, t, q); the two leading buffers ping-pong as
  source/destination each step (``steps`` must be even so the result lands
  back in buffer 0).  The buffer is aliased input->output, so the scan
  carry never copies it.
* Inside, latitude row-blocks stream through VMEM with explicitly
  double-buffered async DMA (two input slots / two output slots, DMA
  semaphores): block j+1's rows load and block j-2's results store while
  block j computes.  Periodic latitude wrap = three input copies per block
  (head/body/tail with mod-H row arithmetic) — the state needs NO padded
  halos in HBM, which also kills the per-step ``refresh_rows`` strips.

The compute per block is byte-for-byte the v4 body
(:func:`gcmiipy_tpu.ops.pallas_stencil.matsuno_block_body` — both Matsuno
halves + the band-limited in-VMEM DFT polar filter), so numerics match the
v4/mega path exactly; parity vs the XLA core is enforced by
``scripts/tpu_parity.py`` on hardware and the interpret-mode tests in
``tests/test_stream.py``.

Reference anchor: the hot loop this exists to beat is the reference's
``dynamics.py:230-237`` Matsuno step (SURVEY.md section 3.1).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gcmiipy_tpu.ops import polar_filter
from gcmiipy_tpu.ops.pallas_stencil import (
    FILTER_CHUNK, MEGA_MAX_WIDTH, PHJ, _geom_row_consts, block_chunk_counts,
    block_chunk_counts_split, matsuno_block_body, matsuno_block_stages)


def n_planes(layers):
    """Packed field-plane count: p + the four (L, H, W) prognostics."""
    return 1 + 4 * layers


def pack_state(p, u, v, t, q, gt=None):
    """Stack (p, u, v, t, q) into the (1+4L, H, W) plane layout.

    ``gt``: optional ground-temperature surface plane appended last —
    the in-kernel physics epilogue advances it alongside the prognostics
    (``make_stream_kernel(physics=...)``)."""
    planes = [p[None], u, v, t, q]
    if gt is not None:
        planes.append(gt[None])
    return jnp.concatenate(planes, axis=0)


def unpack_state(packed, layers):
    """Inverse of :func:`pack_state`."""
    L = layers
    return (packed[0], packed[1:1 + L], packed[1 + L:1 + 2 * L],
            packed[1 + 2 * L:1 + 3 * L], packed[1 + 3 * L:1 + 4 * L])


# Widest grid whose DFT factor matrices stay RESIDENT in VMEM: past
# MEGA_MAX_WIDTH (the v4 limit) they are stored bf16-compact (see below)
# and latitude tiles shrink, which fits W=2048 where v4 measured 172MB >
# the 128MB chip.
STREAM_RESIDENT_MAX_WIDTH = 2048
# Past that, the factors ride in HBM and stream through two VMEM chunk
# slots with double-buffered DMA inside the banded filter loop
# (matsuno_block_stages body_streamed): VMEM holds O(W * FILTER_CHUNK),
# not O(W^2).  The remaining O(W^2) is HBM capacity only.
STREAM_MAX_WIDTH = 4096


def stream_grid_supported(geom):
    """Practical streaming-kernel envelope (measured on v5e).

    Resident factors carry any H to W=2048 (the production-'high' W=2048
    kernel needs the 127MB wide VMEM self-limit); HBM-streamed factors
    carry W=4096 at ANY height since round 5: full 4096-lane rows spill
    85.3MB of register slots (H-independent — measured), so the VPU
    tendency stages run lon-TILED in 1024-lane sub-tiles with a 128-lane
    wrap halo (the in-VMEM filter matmuls keep full rows), and for H > 64
    the H-scaled mask/heightmap tables move to HBM with per-block DMA
    staging (`big_tables`) — together: 512x4096 compiles and runs
    (was a v1-pipeline fallback through round 4).
    """
    H, W = geom.height, geom.width
    if H % 8 or W % 128 or H < 16:
        return False
    return W <= STREAM_MAX_WIDTH


def make_stream_kernel(geom, dt, steps, coriolis=False, dtype=jnp.float32,
                       tile_j=None, filter_precision="high",
                       band_limit=True, interpret=False,
                       vmem_limit_bytes=125 * 1024 * 1024,
                       q_limiter=False, pipeline=False, _copy_body=False,
                       _wide_factor_dtype=None, filter_split_tau=0.0,
                       local_height=None, geom_as_args=False,
                       _stream_factors=None, physics=None):
    """Build ``multi(S) -> S`` running ``steps`` Matsuno steps in one launch.

    ``S`` is the packed double buffer ``(2, 1+4L, H, W)``: buffer 0 holds
    the state (buffer 1 is scratch whose contents are ignored on entry);
    on return buffer 0 holds the advanced state (``steps`` must be even).

    ``physics``: optional dict enabling the IN-KERNEL per-step physics
    epilogue (round-5; closes the pe=1 gap — reference cadence applies
    physics after EVERY step, ``no_limits_2_5d.py:79-94``, which
    previously forced the per-step mega4 fallback).  Keys: ``t_lw``,
    ``t_sw``, ``albedo`` (scalars), ``drag_tau`` (0 = off),
    ``convection_sweeps`` (0 = off; the FIXED-sweep Manabe adjustment —
    Mosaic has no while_loop, so the adaptive early-exit form stays an
    XLA-side option), ``seasonal``/``obliquity``/``year_days``.  The
    packed buffer grows a ground-temperature plane (``pack_state(...,
    gt=...)``) and ``multi(S, utc0)`` takes the chunk-start model clock;
    each in-kernel step s applies grey radiation (static-ladder form,
    :func:`gcmiipy_tpu.physics.radiation.basic_grey_radiation_ladder`),
    optional convection and surface drag to its freshly computed core
    rows at utc0 + s*dt — numerics match the per-step mega4 extras path
    (physics is column-local, core rows are exact per step).

    ``tile_j`` rows of latitude stream per block; every block additionally
    reads the PHJ-row halo above and below (1.5x read amplification at
    tile_j=32, 1.25x at 64) — the price of whole-step fusion, identical to
    the v4 kernel's overlap-recompute scheme.

    ``pipeline=True`` processes latitude blocks in PAIRS with the
    per-block stages interleaved (:func:`pallas_stencil.matsuno_block_stages`)
    so one block's banded-filter MXU matmuls are data-independent of the
    other block's tendency VPU stages.  MEASURED NEGATIVE RESULT (v5e,
    round 3, scripts/stream_probe.py --pipeline): Mosaic does NOT
    co-schedule the independent streams — 2.17 ms/step vs the plain
    loop's 2.12 at tile_j=32 (and the pair's 2x-live VMEM OOMs the
    compile at tile_j=64).  Kept behind this flag as the documented
    experiment: numerics are BITWISE identical to the plain order (each
    block's computation graph is unchanged; only cross-block statement
    order differs — gated on hardware by scripts/tpu_parity.py), so any
    future Mosaic scheduler improvement can be re-probed by flipping the
    flag.  Defaults ``tile_j`` to 32: two compute-live windows + two
    prefetch slots at tile 64 exceed the 128 MB v5e VMEM.
    """
    H, W, L = geom.height, geom.width, geom.layers
    if local_height is not None:
        # lat-ring shard use (parallel/shard_step.make_shard_stream_ring):
        # the kernel covers local_height rows (shard core + the K*PHJ-row
        # recompute halo); its in-kernel row wrap is mod local_height,
        # which only pollutes the sacrificial halo rows
        H = local_height
    dtype = jnp.dtype(dtype)
    NP = n_planes(L)
    # the physics epilogue carries ground temperature as one extra plane
    NPP = NP + 1 if physics else NP
    if physics and geom_as_args:
        raise ValueError("physics epilogue + geom_as_args (lat-ring "
                         "shards) is not supported yet; use the "
                         "single-device stream or the mega4 ring")
    if physics and pipeline:
        pipeline = False
    if steps % 2:
        raise ValueError(f"steps must be even (buffer ping-pong), got {steps}")
    if not interpret and W > STREAM_MAX_WIDTH:
        raise ValueError(
            f"W={W} > {STREAM_MAX_WIDTH}: the streamed O(W*chunk) factor "
            "slots still leave O(W) block rows beyond VMEM at this width "
            "— use the v1 'fused' pipeline or the XLA backend")
    # Wide grids (past the v4 limit): hi/lo-split bf16 factor matrices
    # (forward AND inverse; see the split_inv note below — a 1-pass
    # inverse is measurably unstable on wide grids) + small latitude
    # tiles.  The split pair stored bf16 is byte-identical in size to one
    # f32 matrix and carries f32-level fidelity.
    wide = W > MEGA_MAX_WIDTH and not interpret
    wide_store = jnp.dtype(_wide_factor_dtype or jnp.bfloat16)
    if wide and vmem_limit_bytes == 125 * 1024 * 1024:
        # the production-'high' W=2048 kernel measures 126.45MB scoped
        # (1.45MB over the default self-limit); v5e capacity is 128MB
        vmem_limit_bytes = 127 * 1024 * 1024
    # Factor residency: beyond STREAM_RESIDENT_MAX_WIDTH the factors
    # cannot sit in VMEM at all — stream them chunk-by-chunk from HBM
    # (_stream_factors=True forces it for tests).
    stream_factors = (_stream_factors if _stream_factors is not None
                      else W > STREAM_RESIDENT_MAX_WIDTH and not interpret)
    # Wide + tall (round 5): the H-scaled mask/heightmap tables move to
    # HBM with per-block DMA staging — together with the lon-tiled VPU
    # stages (pallas_stencil.STREAM_LON_TILE) this is what lets W=4096
    # run at any height instead of the old H<=64 envelope
    big_tables = stream_factors and H > 64
    if tile_j is None:
        from gcmiipy_tpu.ops.pallas_stencil import default_step_tile_j
        # measured (v5e, 9x512x1024, 200-step): tj=64 1.886-1.983 ms/step
        # vs tj=32 1.946-2.009 — the body amplification win (1.25x vs
        # 1.5x) slightly beats the coarser filter-band granularity
        # wide tiles: 16 rows fit W=2048 up to H=512; taller wide grids
        # (the mask/heightmap row tables scale with H and the 'high'
        # split-inverse spills registers) and W=4096 need 8 (measured
        # scoped-VMEM OOMs at 16)
        tile_j = ((16 if W <= 2048 and H <= 512 else 8) if wide
                  else (32 if pipeline else default_step_tile_j(W, L)))
        if tile_j == 64 and filter_precision in ("high", "highest"):
            # tile-64 under a split/exact INVERSE does not compile even
            # with bf16-stored factor pairs (the extra inverse-split
            # transients overflow scoped VMEM; measured at 9x512x1024);
            # tile 32 runs 2.23 ms/step there
            tile_j = 32
    while H % tile_j or H // tile_j < 2:
        tile_j //= 2
        if tile_j < 8:
            raise ValueError(f"no tile_j >= 8 divides H={H} with >= 2 blocks")
    if tile_j % 8:
        raise ValueError(f"tile_j must be a multiple of 8, got {tile_j}")
    nj = H // tile_j
    if pipeline and (nj % 2 or _copy_body):
        import warnings

        warnings.warn(f"stream pipeline needs an even block count "
                      f"(nj={nj}) and a real body; falling back to the "
                      f"unpipelined block loop")
        pipeline = False
    n_islots = 4 if pipeline else 2
    hj = PHJ
    tj_in = tile_j + 2 * hj

    if filter_precision not in ("highest", "high", "fwd_high", "default"):
        raise ValueError(f"bad filter_precision {filter_precision!r}")
    if wide and filter_precision == "highest":
        raise ValueError(
            "filter_precision='highest' needs f32-exact factor matrices, "
            f"which do not fit VMEM at W={W}; use 'high'/'fwd_high'")
    f32_hw = dtype == jnp.float32 and not interpret
    # precision-selective banding (see block_chunk_counts_split): weakly-
    # damped chunks run 1-pass instead of the split passes.  The flag is
    # precision-keyed (not f32_hw-keyed) so interpret-mode tests exercise
    # the two-loop control flow; off-hardware both loop bodies are exact.
    # Wide grids opt out: the second loop body's scoped-VMEM cost tips
    # W=2048 over the 125MB limit (measured +1.46MB over), and the mask
    # study shows near-zero chunk savings there anyway (the anisotropic
    # mask damps almost everything strongly).
    selective = (filter_split_tau > 0 and band_limit
                 and filter_precision in ("high", "fwd_high")
                 and not stream_factors and not wide)
    if stream_factors and pipeline:
        import warnings

        warnings.warn("stream_factors (W > resident limit) does not "
                      "compose with the pair pipeline; running the plain "
                      "block loop", stacklevel=2)
        pipeline = False

    # ---- host-side constants (same prep as the v4 kernel) ----------------
    CS_np, CwSw_np, nb = polar_filter.banded_pair_matrices(
        W, dtype=np.dtype(dtype), chunk=FILTER_CHUNK)
    n_chunks_full = nb // FILTER_CHUNK
    ncols = 2 * nb
    if not geom_as_args:
        mask_np = np.pad(
            polar_filter.banded_correction_mask_pair(
                geom.polar_mask, nb, dtype=np.dtype(dtype)),
            ((hj, hj), (0, 0)), mode="wrap")                   # (Hp, 2nb)
        if selective:
            nch_np = block_chunk_counts_split(geom.polar_mask, tile_j,
                                              4, tile_j + 12,
                                              filter_split_tau)
        elif band_limit:
            nch_np = block_chunk_counts(geom.polar_mask, tile_j,
                                        4, tile_j + 12)
        else:
            nch_np = np.full((nj, 1), n_chunks_full, np.int32)
        if _copy_body == "nofilter":   # perf probe: body w/o the filter MXU
            nch_np = np.zeros_like(nch_np)
            _copy_body = False
        wall_np = np.zeros((H, 1), dtype)
        wall_np[H - 1, 0] = 1.0
        wall_np = np.pad(wall_np, ((hj, hj), (0, 0)),
                         mode="wrap")                           # (Hp, 1)

    split_fwd = filter_precision in ("high", "fwd_high") and f32_hw
    # WIDE grids promote fwd_high's inverse to the hi/lo split too.
    # Measured necessity (round 3): a single DEFAULT-precision inverse
    # matmul loses ~2^-8 of the CORRECTION, and on wide (anisotropic)
    # grids the correction is O(field) while the unfiltered residual sits
    # at near-CFL-critical polar wavenumbers — 2 Matsuno steps amplified
    # that into 0.42 relative error in a PURE-XLA/CPU reproduction (no
    # Mosaic involved; the on-TPU wide parity gate caught it at 0.68).
    # The split pair stored bf16 costs the same 4 bytes/entry as f32 and
    # restores f32 fidelity at 3 inverse matmuls instead of 1.
    split_inv = (filter_precision == "high"
                 or (wide and filter_precision == "fwd_high")) and f32_hw
    prec = (jax.lax.Precision.DEFAULT
            if filter_precision in ("default", "fwd_high")
            else jax.lax.Precision.HIGHEST)

    if physics:
        from gcmiipy_tpu import constants as _const
        from gcmiipy_tpu.physics import convection as _conv
        from gcmiipy_tpu.physics import radiation as _rad

        ph = dict(physics)
        sig_vals = [float(x) for x in np.asarray(geom.sig).ravel()]
        dsig_vals = [float(x) for x in np.asarray(geom.dsig).ravel()]
        ptop_f = float(geom.ptop)
        # kernels may not capture array constants: longitudes ride as a
        # (1, W) VMEM input
        long_c = jnp.asarray(geom.long, dtype).reshape(1, W)

        def physics_epilogue(p_c, u_c, v_c, t_c, q_c, gt_c, lat_c, longs,
                             utc_s):
            """Per-step column physics on the cropped core rows: grey
            radiation (static-ladder), optional fixed-sweep convection,
            surface drag.  Mirrors driver.physics_extras at
            physics_every=1 (utc_s = the clock at the START of the
            just-completed step)."""
            tp = jnp.stack([p_c * s_ + ptop_f for s_ in sig_vals])
            exner_inv = (_const.P0 / tp) ** _const.kappa
            tt = t_c / exner_inv
            decl = (_rad.solar_declination(utc_s,
                                           ph.get("obliquity", 23.44),
                                           ph.get("year_days", 365.0))
                    if ph.get("seasonal") else 0.0)
            sza = _rad.zenith_angle(longs, lat_c, utc_s, geom,
                                    declination=decl)
            dTdt, dtg = _rad.basic_grey_radiation_ladder(
                p_c, tt, gt_c, ph["t_lw"], ph["t_sw"], ph["albedo"],
                sza, dsig_vals)
            gt_n = gt_c + dtg * dt
            tt = tt + dTdt * dt
            sweeps = ph.get("convection_sweeps", 0)
            if sweeps:
                dp = jnp.stack([p_c * d_ for d_ in dsig_vals])
                tt = _conv.convective_adjustment(tt, tp, dp,
                                                 adaptive=False,
                                                 sweeps=sweeps)
            t_n = tt * exner_inv
            tau = ph.get("drag_tau", 0.0)
            if tau > 0:
                f = 1.0 / (1.0 + dt / tau)
                u_c = jnp.concatenate([u_c[:1] * f, u_c[1:]], axis=0)
                v_c = jnp.concatenate([v_c[:1] * f, v_c[1:]], axis=0)
            return u_c, v_c, t_n, gt_n

    def kernel(S_in, dxj_ref, dxh_ref, lat_ref, hm_ref, wall_ref,
               sigt_ref, sigb_ref, sig_ref, dsig_ref,
               CS_ref, CwSw_ref, mask_ref, nch_ref, ns_ref, *rest):
        del S_in  # aliased with S_ref; all access goes through S_ref
        if physics:
            (utc_ref, long_ref, S_ref, ibuf, obuf, mwin, isem, osem,
             *fbufs) = rest
        else:
            utc_ref = long_ref = None
            S_ref, ibuf, obuf, mwin, isem, osem, *fbufs = rest
        if big_tables:
            # H-scaled tables live in HBM; their staging scratch rides
            # after the factor slots
            *fbufs, hm_win, tsem = fbufs
        factor_dma = tuple(fbufs) if fbufs else None
        mk = pltpu.make_async_copy

        def in_dmas(par, slot, j):
            """The three input copies of block j (head/body/tail wrap)."""
            r0 = j * tile_j
            head = jax.lax.rem(r0 - hj + H, H)
            tail = jax.lax.rem(r0 + tile_j, H)
            return (
                mk(S_ref.at[par, :, pl.ds(pl.multiple_of(head, 8), hj), :],
                   ibuf.at[slot, :, 0:hj, :], isem.at[slot, 0]),
                mk(S_ref.at[par, :, pl.ds(pl.multiple_of(r0, 8), tile_j), :],
                   ibuf.at[slot, :, hj:hj + tile_j, :], isem.at[slot, 1]),
                mk(S_ref.at[par, :, pl.ds(pl.multiple_of(tail, 8), hj), :],
                   ibuf.at[slot, :, hj + tile_j:, :], isem.at[slot, 2]),
            )

        def out_dma(par, slot, j):
            r0 = j * tile_j
            return mk(obuf.at[slot],
                      S_ref.at[1 - par, :,
                               pl.ds(pl.multiple_of(r0, 8), tile_j), :],
                      osem.at[slot])

        def start_in(par, slot, j):
            for c in in_dmas(par, slot, j):
                c.start()

        def wait_in(par, slot, j):
            for c in in_dmas(par, slot, j):
                c.wait()

        def unpack_win(win):
            return (win[0], win[1:1 + L], win[1 + L:1 + 2 * L],
                    win[1 + 2 * L:1 + 3 * L], win[1 + 3 * L:NP])

        def block_env(j, mref):
            """Block-local geometry rows, wall mask, staged filter mask."""
            r0 = pl.multiple_of(j * tile_j, 8)
            rows = pl.ds(r0, tj_in)
            if big_tables:
                # wide + tall: the (H+2hj, 2nb)/(H+2hj, W) mask and
                # heightmap tables scale with H and do not fit VMEM next
                # to the wide working set (measured: W=4096 H=512 needs
                # 129.2MB with them resident) — they live in HBM and the
                # block's rows DMA through scratch
                cm = mk(mask_ref.at[rows, :], mref, tsem.at[0])
                ch = mk(hm_ref.at[rows, :], hm_win, tsem.at[1])
                cm.start()
                ch.start()
                cm.wait()
                ch.wait()
                hm_rows = hm_win[:, :]
            else:
                hm_rows = hm_ref[rows, :]
            lgeom = dataclasses.replace(
                geom,
                dx_j=dxj_ref[rows].reshape(1, tj_in, 1),
                dx_h=dxh_ref[rows].reshape(1, tj_in, 1),
                lat=lat_ref[rows],
                heightmap=hm_rows,
                sigt=sigt_ref[:], sigb=sigb_ref[:],
                sig=sig_ref[:], dsig=dsig_ref[:])
            keep = 1.0 - wall_ref[rows]
            # stage this block's mask rows into a scratch REF: the shared
            # body's chunk loop needs ref loads (static sublanes + dynamic
            # pl.ds lanes) — Mosaic cannot dynamic-slice a materialized
            # array, and the whole-mask ref would need an unaligned
            # dynamic sublane offset
            if not big_tables:
                mref[:, :] = mask_ref[rows, :]
            nch = ((nch_ref[j, 0], nch_ref[j, 1]) if selective
                   else nch_ref[j, 0])
            return lgeom, keep, nch

        def compute(j, win, s=None):
            """v4 block body on the (NPP, tj_in, W) input window; with the
            physics epilogue, ``s`` (the in-launch step index) times the
            per-step clock."""
            if _copy_body:
                # perf probe: DMA pipeline floor (numerically meaningless)
                return win[:, hj:hj + tile_j, :]
            base = unpack_win(win)
            lgeom, keep, nch = block_env(j, mwin)
            p_n, u_n, v_n, t_n, q_n = matsuno_block_body(
                base, lgeom, keep, mwin, nch,
                CS_ref, CwSw_ref,
                dt, coriolis, split_fwd, split_inv, prec, dtype,
                q_limiter=q_limiter, factor_dma=factor_dma,
                lon_tile=1024 if big_tables else None)
            if physics:
                gt_c = win[NP, hj:hj + tile_j, :]
                lat_c = lgeom.lat[hj:hj + tile_j]
                utc_s = utc_ref[0] + s.astype(dtype) * dt
                u_n, v_n, t_n, gt_n = physics_epilogue(
                    p_n, u_n, v_n, t_n, q_n, gt_c, lat_c, long_ref[:, :],
                    utc_s)
                return jnp.concatenate(
                    [p_n[None], u_n, v_n, t_n, q_n, gt_n[None]], axis=0)
            return jnp.concatenate(
                [p_n[None], u_n, v_n, t_n, q_n], axis=0)

        def compute_pair(a, b, winA, winB):
            """Both blocks of a pair with their stages INTERLEAVED: each
            filter MXU stage is followed in program order by the OTHER
            block's data-independent VPU stages, so the scheduler can run
            them concurrently.  Per-block numerics identical to
            :func:`compute` (same stage graph, different cross-block
            statement order)."""
            baseA, baseB = unpack_win(winA), unpack_win(winB)
            lgA, keepA, nchA = block_env(a, mwin.at[0])
            lgB, keepB, nchB = block_env(b, mwin.at[1])
            mk_stages = lambda base, lg, keep, mref, nch: \
                matsuno_block_stages(
                    base, lg, keep, mref, nch, CS_ref, CwSw_ref, dt,
                    coriolis, split_fwd, split_inv, prec, dtype,
                    q_limiter=q_limiter)
            preA, filtA, postA, cropA = mk_stages(
                baseA, lgA, keepA, mwin.at[0], nchA)
            preB, filtB, postB, cropB = mk_stages(
                baseB, lgB, keepB, mwin.at[1], nchB)

            def pack(crop, o):
                return jnp.concatenate(
                    [crop(o[0])[None], crop(o[1]), crop(o[2]),
                     crop(o[3]), crop(o[4])], axis=0)

            sA = preA(baseA)
            sB = preB(baseB)
            fA1 = filtA(sA[0], sA[1])            # MXU || (nothing yet)
            fB1 = filtB(sB[0], sB[1])            # MXU || starA VPU below
            starA = postA(baseA, baseA, fA1[0], fA1[1], sA[2], False)
            sA2 = preA(starA)
            fA2 = filtA(sA2[0], sA2[1])          # MXU || starB VPU below
            starB = postB(baseB, baseB, fB1[0], fB1[1], sB[2], False)
            sB2 = preB(starB)
            outA = pack(cropA, postA(baseA, starA, fA2[0], fA2[1], sA2[2],
                                     True))
            fB2 = filtB(sB2[0], sB2[1])          # MXU || outA VPU above
            outB = pack(cropB, postB(baseB, starB, fB2[0], fB2[1], sB2[2],
                                     True))
            return outA, outB

        def step_body(s, _):
            par = s % 2  # jnp promotion: s is i32 from the SMEM step count
            start_in(par, 0, 0)

            def block(j, _):
                slot = jax.lax.rem(j, 2)

                @pl.when(j + 1 < nj)
                def _():
                    start_in(par, jax.lax.rem(j + 1, 2), j + 1)

                wait_in(par, slot, j)
                packed = compute(j, ibuf[slot], s)

                @pl.when(j >= 2)
                def _():
                    out_dma(par, slot, j - 2).wait()

                obuf[slot] = packed
                out_dma(par, slot, j).start()
                return 0

            # block-loop bound as DATA (ns_ref[1]): a static bound lets
            # the compiler treat the block loop as unrollable, which at
            # W=4096 contributes to the register-spill failure; the
            # dynamic bound keeps one block body regardless of H.
            # .astype(int) canonicalizes the index dtype (i64 under the
            # x64 interpret tests, i32 on hardware) so the rem() calls
            # against Python ints keep matching dtypes.
            jax.lax.fori_loop(0, ns_ref[1].astype(int), block, 0)
            # all writes must land before the next step reads this buffer
            out_dma(par, (nj - 2) % 2, nj - 2).wait()
            out_dma(par, (nj - 1) % 2, nj - 1).wait()
            return 0

        def step_body_pipe(s, _):
            """Pair-at-a-time block loop: 2 compute-live windows + 2
            prefetching (4 input slots); output slots 0/1 = pair (a, b)."""
            par = s % 2
            start_in(par, 0, 0)
            start_in(par, 1, 1)

            def pair(g, _):
                a = 2 * g
                b = a + 1
                sa = jax.lax.rem(a, 4)
                sb = jax.lax.rem(b, 4)

                @pl.when(g + 1 < nj // 2)
                def _():
                    start_in(par, jax.lax.rem(a + 2, 4), a + 2)
                    start_in(par, jax.lax.rem(b + 2, 4), b + 2)

                wait_in(par, sa, a)
                wait_in(par, sb, b)
                outA, outB = compute_pair(a, b, ibuf[sa], ibuf[sb])

                @pl.when(g >= 1)
                def _():
                    out_dma(par, 0, a - 2).wait()
                    out_dma(par, 1, b - 2).wait()

                obuf[0] = outA
                out_dma(par, 0, a).start()
                obuf[1] = outB
                out_dma(par, 1, b).start()
                return 0

            jax.lax.fori_loop(0, nj // 2, pair, 0)
            out_dma(par, 0, nj - 2).wait()
            out_dma(par, 1, nj - 1).wait()
            return 0

        if pipeline:
            step_body = step_body_pipe

        # step count as DATA (SMEM scalar): every even K runs through one
        # compiled kernel — a static bound would force a fresh (remote,
        # tens-of-minutes) Mosaic compile per distinct steps value
        jax.lax.fori_loop(0, ns_ref[0], step_body, 0)

    if geom_as_args:
        # sigma ladders are shard-independent closure constants; the
        # per-row tables arrive per call (lat-ring shard use)
        sigt_c = jnp.asarray(geom.sigt, dtype)
        sigb_c = jnp.asarray(geom.sigb, dtype)
        sig_c = jnp.asarray(geom.sig, dtype)
        dsig_c = jnp.asarray(geom.dsig, dtype)
    else:
        (dxj_c, dxh_c, lat_c, hm_c, sigt_c, sigb_c, sig_c, dsig_c
         ) = _geom_row_consts(geom, dtype, hj, 0)

    def prep_mat(M, split):
        M = jnp.asarray(M)
        if not split:
            return M.astype(wide_store) if wide else M
        Mh = M.astype(jnp.bfloat16).astype(dtype)
        # split pairs ALWAYS store bf16: Mh is bf16-exact, Ml's own bf16
        # rounding is ~2^-16 of M (the split scheme's intrinsic error
        # level), and the pair costs the same bytes as ONE f32 matrix --
        # this is what keeps tile_j=64 viable under 'high' (f32-stored
        # split pairs pushed the tile-64 kernel into a scoped-VMEM OOM)
        return jnp.stack([Mh, M - Mh], axis=0).astype(jnp.bfloat16)

    CS_c = prep_mat(CS_np, split_fwd)
    CwSw_c = prep_mat(CwSw_np, split_inv)
    if not geom_as_args:
        mask_c = jnp.asarray(mask_np)
        wall_c = jnp.asarray(wall_np)
        nch_c = jnp.asarray(nch_np)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    aspec = pl.BlockSpec(memory_space=pl.ANY)
    # streamed factors live in HBM (ANY) and flow through 2 VMEM chunk
    # slots; resident factors are whole-array VMEM inputs
    fspec = aspec if stream_factors else vspec
    scratch = [
        pltpu.VMEM((n_islots, NPP, tj_in, W), dtype),
        pltpu.VMEM((2, NPP, tile_j, W), dtype),
        pltpu.VMEM((2, tj_in, ncols) if pipeline
                   else (tj_in, ncols), dtype),
        pltpu.SemaphoreType.DMA((n_islots, 3)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if stream_factors:
        CH2 = 2 * FILTER_CHUNK
        cs_dt = jnp.bfloat16 if split_fwd else (wide_store if wide
                                                else dtype)
        cw_dt = jnp.bfloat16 if split_inv else (wide_store if wide
                                                else dtype)
        scratch += [
            pltpu.VMEM((2, 2, W, CH2) if split_fwd else (2, W, CH2),
                       cs_dt),
            pltpu.VMEM((2, 2, CH2, W) if split_inv else (2, CH2, W),
                       cw_dt),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    if big_tables:
        scratch += [
            pltpu.VMEM((tj_in, W), dtype),    # heightmap rows
            pltpu.SemaphoreType.DMA((2,)),
        ]
    hm_spec = aspec if big_tables else vspec
    mask_spec = aspec if big_tables else vspec
    call = pl.pallas_call(
        kernel,
        in_specs=[aspec] + [vspec] * 3 + [hm_spec] + [vspec] * 5
                 + [fspec, fspec, mask_spec]
                 + [sspec, sspec] + ([sspec, vspec] if physics else []),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((2, NPP, H, W), dtype),
        input_output_aliases={0: 0},
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes),
        interpret=interpret,
    )

    ns_c = jnp.asarray([steps, nj], jnp.int32)

    if geom_as_args:
        def multi(S, geom_arrays):
            """geom_arrays = (dxj, dxh, lat, heightmap, wall, mask, nch):
            the shard's row tables covering local_height + 2*PHJ padded
            rows ((Hp, 1)/(Hp, W)/(Hp, 2nb)), plus the per-block filter
            trip counts ((nj, 1) int32, or (nj, 2) under a selective
            filter_split_tau)."""
            dxj, dxh, lat, hm, wall, mask, nch = geom_arrays
            return call(S, dxj, dxh, lat, hm, wall,
                        sigt_c, sigb_c, sig_c, dsig_c,
                        CS_c, CwSw_c, mask, nch, ns_c)

        multi.tile_j = tile_j
        # the caller building per-shard nch tables must match the
        # kernel's selective decision (wide/stream_factors opt out)
        multi.selective = selective
        return multi

    if physics:
        def multi(S, utc0):
            """``utc0``: model clock [s] at the start of this launch
            (scalar, traced — the epilogue clocks step s at
            utc0 + s*dt)."""
            utc_a = jnp.asarray(utc0, dtype).reshape(1)
            return call(S, dxj_c, dxh_c, lat_c, hm_c, wall_c,
                        sigt_c, sigb_c, sig_c, dsig_c,
                        CS_c, CwSw_c, mask_c, nch_c, ns_c, utc_a, long_c)

        multi.tile_j = tile_j
        multi.physics_planes = NPP
        return multi

    def multi(S):
        return call(S, dxj_c, dxh_c, lat_c, hm_c, wall_c,
                    sigt_c, sigb_c, sig_c, dsig_c,
                    CS_c, CwSw_c, mask_c, nch_c, ns_c)

    multi.tile_j = tile_j
    return multi


def make_stream_matsuno(geom, dt, steps_per_launch=8, coriolis=False,
                        dtype=jnp.float32, tile_j=None,
                        filter_precision="high", band_limit=True,
                        interpret=False, q_limiter=False, pipeline=False,
                        filter_split_tau=0.0, _stream_factors=None):
    """Plain-state wrapper: ``advance(p,u,v,t,q, n) -> (p,u,v,t,q)``.

    Packs once, scans the streaming kernel over ``n // steps_per_launch``
    launches (n must be a multiple of steps_per_launch), unpacks once.
    """
    multi = make_stream_kernel(
        geom, dt, steps_per_launch, coriolis=coriolis, dtype=dtype,
        tile_j=tile_j, filter_precision=filter_precision,
        band_limit=band_limit, interpret=interpret, q_limiter=q_limiter,
        pipeline=pipeline, filter_split_tau=filter_split_tau,
        _stream_factors=_stream_factors)
    L = geom.layers

    def advance(p, u, v, t, q, n):
        if n % steps_per_launch:
            raise ValueError(f"n={n} not a multiple of {steps_per_launch}")
        packed = pack_state(*(x.astype(dtype) for x in (p, u, v, t, q)))
        S = jnp.stack([packed, jnp.zeros_like(packed)])

        def body(S, _):
            return multi(S), None

        S, _ = jax.lax.scan(body, S, None, length=n // steps_per_launch)
        return unpack_state(S[0], L)

    return advance
