"""Matsuno step with the fused Pallas tendency kernel.

Same numerics as :func:`gcmiipy_tpu.dynamics.core25d.matsuno_timestep` —
the kernel body calls the same ``half_timestep_parts`` — but the stencil
work runs as one HBM pass per half step instead of ~12.  The polar filter
and the final momentum update remain XLA ops between kernel calls.
"""

import jax.numpy as jnp

from gcmiipy_tpu.dynamics import core25d
from gcmiipy_tpu.ops import pallas_stencil, polar_filter


def make_fused_matsuno(geom, dt, coriolis=False, dtype=jnp.float32,
                       filter_fn=None, tile_j=None, tile_i=None,
                       interpret=False, q_limiter=False):
    """Build ``step(p,u,v,t,q) -> (p,u,v,t,q)`` running the fused kernel."""
    if filter_fn is None:
        filter_fn = polar_filter.arakawa_1977
    parts = pallas_stencil.make_fused_parts(
        geom, dt, coriolis=coriolis, dtype=dtype, tile_j=tile_j,
        tile_i=tile_i, interpret=interpret, q_limiter=q_limiter)

    def half(base, seval):
        p, u, v, t, q = base
        sp, su, sv, st, sq = seval
        spu = filter_fn(core25d.calc_pu(sp, su), geom)
        p_n, v_n, t_n, q_n, pu_partial, pg_phi = parts(
            p, u, v, t, q, sp, su, sv, st, sq, spu)
        pgfu = filter_fn(pg_phi, geom)
        pu_n = pu_partial - pgfu * dt
        u_n = core25d.un_pu(pu_n, p_n)
        v_n = v_n.at[:, -1, :].set(0.0)  # polar wall (dynamics.py:222)
        return p_n, u_n, v_n, t_n, q_n

    def step(p, u, v, t, q):
        base = (p, u, v, t, q)
        starred = half(base, base)
        return half(base, starred)

    return step


def make_fused_matsuno_padded(geom, dt, coriolis=False, dtype=jnp.float32,
                              filter_fn=None, tile_j=32, tile_i=None,
                              interpret=False, q_limiter=False):
    """Matsuno step over padded-state arrays (see pallas_stencil.PHJ/PHX).

    ``step(padded_state) -> padded_state`` where padded_state is the
    5-tuple of wrap-padded fields.  Use :func:`pallas_stencil.pad_state` /
    ``core`` to convert at the run boundary; inside a scan no full-array
    padding happens — only strip refreshes.
    """
    from gcmiipy_tpu.ops.pallas_stencil import (
        core as core_of, pad_state, refresh_halo, shifted_core,
        make_fused_parts_padded)

    if filter_fn is None:
        filter_fn = polar_filter.arakawa_1977
    parts = make_fused_parts_padded(
        geom, dt, coriolis=coriolis, dtype=dtype, tile_j=tile_j,
        tile_i=tile_i, interpret=interpret, q_limiter=q_limiter)
    H = geom.height

    def half(base_pad, seval_pad):
        sp_p, su_p = seval_pad[0], seval_pad[1]
        # spu core = su * iph(sp): computed straight off the padded arrays
        spu_core = core_of(su_p) * (core_of(sp_p) + shifted_core(sp_p, 0, 1)) * 0.5
        spu_pad = pad_state(filter_fn(spu_core, geom))

        pn_pad, vn_pad, tn_pad, qn_pad, pup, pg_phi = parts(
            *base_pad, *seval_pad, spu_pad)

        # polar wall on the last core row before halos are refreshed
        from gcmiipy_tpu.ops.pallas_stencil import PHJ
        vn_pad = vn_pad.at[:, PHJ + H - 1, :].set(0.0)

        pn_pad = refresh_halo(pn_pad)
        vn_pad = refresh_halo(vn_pad)
        tn_pad = refresh_halo(tn_pad)
        qn_pad = refresh_halo(qn_pad)

        pgfu = filter_fn(pg_phi, geom)
        pu_n = pup - pgfu * dt
        iph_pn = (core_of(pn_pad) + shifted_core(pn_pad, 0, 1)) * 0.5
        un_pad = pad_state(pu_n * (1.0 / iph_pn))
        return pn_pad, un_pad, vn_pad, tn_pad, qn_pad

    def step(p_pad, u_pad, v_pad, t_pad, q_pad):
        base = (p_pad, u_pad, v_pad, t_pad, q_pad)
        starred = half(base, base)
        return half(base, starred)

    return step


def make_fused_matsuno_padded_v2(geom, dt, coriolis=False, dtype=jnp.float32,
                                 filter_fn=None, tile_j=32, tile_i=None,
                                 interpret=False, q_limiter=False):
    """Matsuno step over padded-state arrays, single-filter pipeline.

    Per half step:  pgf kernel -> ONE batched polar-filter call on the
    stacked [spu; pg_phi] -> rest kernel (which also absorbs the final
    momentum updates).  Halves the filter launches of
    :func:`make_fused_matsuno_padded` and removes the XLA epilogue passes;
    numerics match :func:`core25d.half_timestep_v2` (same half step as the
    reference up to float-add reassociation of the pv force sum).
    """
    from gcmiipy_tpu.ops.pallas_stencil import (
        PHJ, pad_state, refresh_halo, make_pgf_kernel_padded,
        make_rest_kernel_padded)

    if filter_fn is None:
        filter_fn = polar_filter.arakawa_1977
    pgfk = make_pgf_kernel_padded(geom, dtype=dtype, tile_j=tile_j,
                                  tile_i=tile_i, interpret=interpret)
    restk = make_rest_kernel_padded(geom, dt, coriolis=coriolis, dtype=dtype,
                                    tile_j=tile_j, tile_i=tile_i,
                                    interpret=interpret, q_limiter=q_limiter)
    H, L = geom.height, geom.layers

    def half(base_pad, seval_pad):
        sp_p, su_p, st_p = seval_pad[0], seval_pad[1], seval_pad[3]
        stack, pg_phiv = pgfk(sp_p, su_p, st_p)
        filt = filter_fn(stack, geom)
        spu_pad = pad_state(filt[:L])
        pn, un, vn, tn, qn = restk(*base_pad, *seval_pad,
                                   spu_pad, filt, pg_phiv)
        vn = vn.at[:, PHJ + H - 1, :].set(0.0)  # polar wall (dynamics.py:222)
        return tuple(refresh_halo(x) for x in (pn, un, vn, tn, qn))

    def step(p_pad, u_pad, v_pad, t_pad, q_pad):
        base = (p_pad, u_pad, v_pad, t_pad, q_pad)
        starred = half(base, base)
        return half(base, starred)

    return step


def make_fused_matsuno_padded_v3(geom, dt, coriolis=False, dtype=jnp.float32,
                                 tile_j=32, filter_precision="high",
                                 interpret=False, q_limiter=False):
    """Matsuno step over ROWS-padded arrays (pallas_stencil.pad_rows),
    mega-kernel pipeline.

    ONE Pallas call per half step: pgf + polar filter (in-VMEM real-DFT
    matmuls, MXU) + tendency assembly + momentum epilogue.  No intermediate
    touches HBM.  The filter is the same damping mask as the rFFT path;
    ``filter_precision="high"`` (3-pass bf16) carries ~1e-5 relative filter
    error on TPU, "default" (1-pass) ~1e-3 — research mode only.
    """
    from gcmiipy_tpu.ops.pallas_stencil import (
        PHJ, make_mega_kernel_padded, refresh_rows)

    half_kernel = make_mega_kernel_padded(
        geom, dt, coriolis=coriolis, dtype=dtype, tile_j=tile_j,
        filter_precision=filter_precision, interpret=interpret,
        q_limiter=q_limiter)
    H = geom.height

    def half(base_pad, seval_pad):
        pn, un, vn, tn, qn = half_kernel(base_pad, seval_pad)
        vn = vn.at[:, PHJ + H - 1, :].set(0.0)  # polar wall (dynamics.py:222)
        return tuple(refresh_rows(x) for x in (pn, un, vn, tn, qn))

    def step(p_pad, u_pad, v_pad, t_pad, q_pad):
        base = (p_pad, u_pad, v_pad, t_pad, q_pad)
        starred = half(base, base)
        return half(base, starred)

    return step


def make_fused_matsuno_padded_v4(geom, dt, coriolis=False, dtype=jnp.float32,
                                 tile_j=None, filter_precision="high",
                                 interpret=False, band_limit=True,
                                 q_limiter=False, filter_split_tau=0.0):
    """Matsuno step over ROWS-padded arrays: both halves in ONE kernel.

    The v3 mega-kernel is DMA/launch-bound; fusing predictor+corrector
    reads the 5 base fields once per STEP instead of 10 per half and
    launches once.  The polar wall is applied in-kernel.  Numerics match
    v3 (same half-step expressions; the starred state is recomputed on
    block halos instead of exchanged through HBM).

    ``band_limit=True`` (default) runs the in-kernel DFT filter
    band-limited per latitude block (see
    :func:`pallas_stencil.make_mega_step_kernel`): equatorial blocks do a
    fraction of the polar blocks' filter MXU work.  ``filter_precision``
    additionally accepts ``"fwd_high"`` (split-bf16 passes on the forward
    transform only — 2/3 of "high"'s filter MXU cost, but research-grade
    only: its 1-pass inverse measurably corrupts polar rows, see the
    round-3 note in :func:`pallas_stencil.make_mega_half_kernel`).
    """
    from gcmiipy_tpu.ops.pallas_stencil import (
        make_mega_step_kernel, refresh_rows)

    step_kernel = make_mega_step_kernel(
        geom, dt, coriolis=coriolis, dtype=dtype, tile_j=tile_j,
        filter_precision=filter_precision, interpret=interpret,
        band_limit=band_limit, q_limiter=q_limiter,
        filter_split_tau=filter_split_tau)

    def step(p_pad, u_pad, v_pad, t_pad, q_pad):
        out = step_kernel((p_pad, u_pad, v_pad, t_pad, q_pad))
        return tuple(refresh_rows(x) for x in out)

    return step


def fused_grid_supported(geom):
    """The padded-output kernel needs lat tiles of 8 and lon tiles of 128
    (Mosaic tiling divisibility for aligned in-place writes)."""
    return geom.height % 8 == 0 and geom.width % 128 == 0


def make_fused_step(geom, dt, coriolis=False, dtype=jnp.float32,
                    filter_fn=None, tile_j=None, tile_i=None, interpret=None,
                    pipeline="v1", filter_precision="high", q_limiter=False,
                    filter_split_tau=0.0):
    """Drop-in fused replacement for ``core25d.matsuno_timestep``:
    unpadded-state signature, padded-state pipeline inside.

    ``pipeline``: "v1" = fused half-step kernel with the polar filter as a
    separate XLA op (``filter_fn`` honored); "mega" = one kernel per half
    step with the DFT filter fused in-VMEM (``filter_fn`` ignored,
    ``filter_precision`` applies); "mega4" = the whole Matsuno step
    (both halves) in one kernel with the band-limited DFT filter — the
    fastest verified pipeline.  Grids whose height is not a multiple of 8
    or width not a multiple of 128 fall back to the XLA core (same
    numerics, slower) — with a warning, since the perf difference is ~5x."""
    if not fused_grid_supported(geom):
        import warnings

        from gcmiipy_tpu.dynamics import core25d
        warnings.warn(
            f"fused backend '{pipeline}' needs 8 | height and 128 | width; "
            f"grid {geom.height}x{geom.width} falls back to the XLA core "
            "(same numerics, ~5x slower)", stacklevel=2)
        return lambda *s: core25d.matsuno_timestep(
            *s, dt, geom, filter_fn=filter_fn, coriolis=coriolis,
            q_limiter=q_limiter)

    if interpret is None:
        import jax
        interpret = jax.default_backend() != "tpu"

    from gcmiipy_tpu.ops.pallas_stencil import (
        MEGA_MAX_WIDTH, core as core_of, core_rows, pad_rows, pad_state)

    if (pipeline in ("mega", "mega4") and not interpret
            and geom.width > MEGA_MAX_WIDTH):
        import warnings
        warnings.warn(
            f"backend '{pipeline}' fuses the DFT polar filter in VMEM and "
            f"tops out at width {MEGA_MAX_WIDTH} (O(W^2) factor matrices); "
            f"grid {geom.height}x{geom.width} falls back to the v1 fused "
            "pipeline with the XLA polar filter", stacklevel=2)
        pipeline = "v1"

    if pipeline == "mega4":
        step_padded = make_fused_matsuno_padded_v4(
            geom, dt, coriolis=coriolis, dtype=dtype, tile_j=tile_j,
            filter_precision=filter_precision, interpret=interpret,
            q_limiter=q_limiter, filter_split_tau=filter_split_tau)
        pad_fn, core_fn = pad_rows, core_rows
    elif pipeline == "mega":
        step_padded = make_fused_matsuno_padded_v3(
            geom, dt, coriolis=coriolis, dtype=dtype,
            tile_j=32 if tile_j is None else tile_j,
            filter_precision=filter_precision, interpret=interpret,
            q_limiter=q_limiter)
        pad_fn, core_fn = pad_rows, core_rows
    else:
        step_padded = make_fused_matsuno_padded(
            geom, dt, coriolis=coriolis, dtype=dtype, filter_fn=filter_fn,
            tile_j=32 if tile_j is None else tile_j,
            tile_i=tile_i, interpret=interpret, q_limiter=q_limiter)
        pad_fn, core_fn = pad_state, core_of

    def step(p, u, v, t, q):
        s = tuple(pad_fn(x.astype(dtype)) for x in (p, u, v, t, q))
        s = step_padded(*s)
        return tuple(core_fn(x) for x in s)

    return step
