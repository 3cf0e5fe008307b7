"""Top-level 2.5D model driver.

TPU-native twin of reference ``no_limits_2_5d.py``: builds geometry and
initial conditions, then advances the Matsuno core (optionally + grey
radiation physics) for N steps.

Where the reference runs a Python ``for`` loop with a tqdm bar over
``full_timestep`` (reference ``no_limits_2_5d.py:230-234``), this driver
compiles the entire run as ``lax.scan`` inside one ``jit`` with donated state
buffers; per-step diagnostics (the reference's STATS defaultdict,
``no_limits_2_5d.py:63,85-91``) come back as stacked arrays from the scan.
A Python-loop path with a user callback is kept for interactive use.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gcmiipy_tpu.dynamics import core25d, energy
from gcmiipy_tpu.grid import geometry
from gcmiipy_tpu.model.config import ModelConfig
from gcmiipy_tpu.model.state import GroundVars, ModelState, PrognosticVars, gen_initial_conditions
from gcmiipy_tpu.ops import polar_filter
from gcmiipy_tpu.physics import radiation, thermo


class StepStats(NamedTuple):
    """Per-step diagnostics (reference no_limits_2_5d.py:85-91)."""
    u_max: jnp.ndarray
    u_min: jnp.ndarray
    v_max: jnp.ndarray
    v_min: jnp.ndarray
    ke: jnp.ndarray
    ate: jnp.ndarray
    geo: jnp.ndarray
    total_energy: jnp.ndarray


def make_filter_fn(config, geom):
    """Select the polar-filter implementation (SURVEY.md section 5.7).

    'fft' (default): exact, XLA FFT.  'matmul': exact per-row circulant —
    O(J*I^2) memory, for small grids / sharded runs.  'dft': shared-matrix
    real-DFT matmuls on the MXU — ~15% faster steps at ~1e-4 relative
    filter error (see polar_filter.arakawa_1977_dft).
    """
    if config.polar_filter == "matmul":
        F = polar_filter.build_filter_matrices(geom, dtype=np.dtype(config.dtype))
        return lambda q, geom: polar_filter.arakawa_1977_matmul(q, F)
    if config.polar_filter == "dft":
        mats = polar_filter.build_dft_matrices(geom.width,
                                               dtype=np.dtype(config.dtype))
        return lambda q, geom: polar_filter.arakawa_1977_dft(q, geom, mats)
    return polar_filter.arakawa_1977


def solar_timestep(t, p, g, dt, utc, geom, config):
    """Radiative heating step (reference no_limits_2_5d.py:66-75), plus
    optional Manabe-Strickler convective adjustment (beyond-reference —
    the reference has no convection; physics/convection.py)."""
    sig = jnp.asarray(geom.sig, t.dtype)
    ptop = jnp.asarray(geom.ptop, t.dtype)
    tp = p * sig + ptop
    tt = thermo.to_true_temp(t, tp)
    dt_air, dt_ground = radiation.basic_grey_radiation(
        p, tp, tt, g, config.t_lw, config.t_sw, config.albedo, utc, geom)
    gt_n = g.gt + dt_ground * dt
    tt_n = tt + dt_air * dt
    if config.convection:
        from gcmiipy_tpu.physics import convection
        dsig = jnp.asarray(geom.dsig, t.dtype)
        tt_n = convection.convective_adjustment(tt_n, tp, p * dsig)
    t_n = thermo.to_potential_temp(tt_n, tp)
    return t_n, GroundVars(gt_n, g.gw, g.snow, g.ice)


def make_dynamics_step(geom, config, filter_fn, mesh=None):
    """Select the stencil backend: plain XLA, the fused Pallas half-step
    kernel, or the mega-kernel (filter fused in-VMEM).

    With ``mesh`` (a lat-ring device mesh with a 'y' axis): fused-family
    backends run the explicit-halo lat-ring whole-step kernel
    (:func:`gcmiipy_tpu.parallel.shard_step.make_shard_step_fused4`);
    the XLA backend runs the roll-based core and lets GSPMD insert the
    collectives (shardings come from the caller's jit annotations).

    The 'stream' backend is handled by :func:`make_run_fn` (it advances
    ``config.stream_steps`` per launch, which does not fit the
    one-step-at-a-time contract here); for the single-step uses (callback
    path) it degrades to 'mega4'.
    """
    backend = config.backend
    if backend == "stream":
        backend = "mega4"
    if mesh is not None and backend in ("fused", "mega", "mega4"):
        from gcmiipy_tpu.parallel import shard_step
        import jax as _jax
        return shard_step.make_shard_step_fused4(
            mesh, geom, config.dt, coriolis=config.coriolis,
            dtype=np.dtype(config.dtype),
            filter_precision=config.filter_precision,
            interpret=_jax.default_backend() != "tpu", jit=False,
            q_limiter=config.q_limiter)
    if backend in ("fused", "mega", "mega4"):
        from gcmiipy_tpu.dynamics import fused
        return fused.make_fused_step(
            geom, config.dt, coriolis=config.coriolis,
            dtype=jnp.dtype(config.dtype), filter_fn=filter_fn,
            pipeline="v1" if backend == "fused" else backend,
            filter_precision=config.filter_precision,
            q_limiter=config.q_limiter)
    return lambda *s: core25d.matsuno_timestep(
        *s, config.dt, geom, filter_fn=filter_fn, coriolis=config.coriolis,
        q_limiter=config.q_limiter)


def full_timestep(state: ModelState, geom, config, filter_fn,
                  dynamics_step=None) -> ModelState:
    """Dynamics step (+ optional physics) (reference no_limits_2_5d.py:79-104).

    The reference's physics step is dead code behind an early return
    (``no_limits_2_5d.py:94``); here it is enabled by ``config.physics``.
    Cadenced extras (the Shapiro FILTER) key off the state's exact integer
    step counter.
    """
    if dynamics_step is None:
        dynamics_step = make_dynamics_step(geom, config, filter_fn)
    prog, g, utc, step = state
    p, u, v, t, q = prog
    p, u, v, t, q = dynamics_step(p, u, v, t, q)
    if config.drag_tau > 0:
        # Rayleigh surface drag (GCM-II SDRAG/friction analog — stubs in
        # the reference, port.py:539-599); implicit decay is
        # unconditionally stable
        f = 1.0 / (1.0 + config.dt / config.drag_tau)
        u = u.at[0].multiply(f)
        v = v.at[0].multiply(f)
    if config.shapiro_every > 0:
        # GCM-II FILTER: zonal Shapiro smoothing of p and/or t every k
        # steps (stub in the reference, port.py:566-590)
        from gcmiipy_tpu.ops import shapiro

        due = (step + 1) % config.shapiro_every == 0

        def smooth(ops):
            return shapiro.filter_prognostics(
                *ops, order=config.shapiro_order,
                fields=config.shapiro_fields,
                slp=config.shapiro_slp, geom=geom)

        p, t = jax.lax.cond(due, smooth, lambda ops: ops, (p, t))
    if config.physics:
        t, g = solar_timestep(t, p, g, config.dt, utc, geom, config)
        if config.evaporation:
            # bulk-aerodynamic surface evaporation (beyond-reference:
            # declared empty in reference evaporation.py:5-9)
            from gcmiipy_tpu.physics import evaporation as evap

            sig = jnp.asarray(geom.sig, t.dtype)
            ptop = jnp.asarray(geom.ptop, t.dtype)
            tt = thermo.to_true_temp(t, p * sig + ptop)
            q, gt_n, gw_n = evap.evaporation_step(
                p, q, u, v, tt, g.gt, g.gw, config.dt, geom)
            g = g._replace(gt=gt_n, gw=gw_n)
    return ModelState(PrognosticVars(p, u, v, t, q), g, utc + config.dt,
                      step + 1)


def collect_stats(state: ModelState, geom) -> StepStats:
    prog = state.prog
    ke, ate, geo, tot = energy.calc_energy(
        prog.p, prog.u, prog.v, prog.t, prog.q, geom)
    return StepStats(
        u_max=jnp.max(prog.u), u_min=jnp.min(prog.u),
        v_max=jnp.max(prog.v), v_min=jnp.min(prog.v),
        ke=ke, ate=ate, geo=geo, total_energy=tot)


class GuardInfo(NamedTuple):
    """Result of the blow-up guard: ``ok`` per run, first bad step (-1 when
    the run stayed healthy)."""
    ok: jnp.ndarray
    blown_step: jnp.ndarray


def state_bad(state: ModelState, config) -> jnp.ndarray:
    """NaN sweep over the prognostics + the GCM-II surface-pressure bounds
    (reference no_limits_2_5d.py:213; port.py:295-310 screams at
    PA > 1150 mb) + the CHECKT temperature-reasonableness check (a
    docstring-only stub in the reference, port.py:593-599) when
    ``config.guard_t_max > 0`` — bounds on potential temperature."""
    from gcmiipy_tpu import diagnostics
    p = state.prog.p
    bad = diagnostics.any_nan(*state.prog)
    bad = bad | jnp.any(p > config.guard_p_max)
    bad = bad | jnp.any(p <= config.guard_p_min)
    if config.guard_t_max > 0 or config.guard_t_min > 0:
        t = state.prog.t
        if config.guard_t_max > 0:
            bad = bad | jnp.any(t > config.guard_t_max)
        if config.guard_t_min > 0:
            bad = bad | jnp.any(t <= config.guard_t_min)
    return bad


def _make_stream_run_fn(geom, config, timesteps):
    """Run-function builder for the 'stream' backend: the scan advances
    ``config.stream_steps`` Matsuno steps per iteration through the
    streaming multi-step kernel (:mod:`gcmiipy_tpu.ops.pallas_stream`).

    Guard and stats operate at chunk granularity: ``GuardInfo.blown_step``
    names the FIRST step of the chunk that went bad (the true bad step is
    within [blown_step, blown_step + stream_steps)), and stats stack one
    entry per chunk.  Per-step extras (physics, drag, Shapiro) cannot run
    inside a multi-step launch — requesting them raises.
    """
    import warnings

    from gcmiipy_tpu.dynamics.fused import fused_grid_supported
    from gcmiipy_tpu.ops import pallas_stream
    from gcmiipy_tpu.ops.pallas_stream import STREAM_MAX_WIDTH

    if config.physics or config.drag_tau > 0 or config.shapiro_every > 0:
        raise ValueError(
            "backend 'stream' runs pure dynamics only (per-step physics/"
            "drag/Shapiro cannot run inside a multi-step launch); use "
            "'mega4' for full-featured runs")
    if (timesteps < 2 or not fused_grid_supported(geom)
            or geom.width > STREAM_MAX_WIDTH or geom.height < 16):
        import dataclasses as _dc
        warnings.warn(
            f"backend 'stream' needs >= 2 steps and a grid with 8 | H "
            f"(H >= 16) and 128 | W <= {STREAM_MAX_WIDTH}; "
            f"{timesteps} steps on {geom.height}x{geom.width} falls back "
            "to 'mega4'", stacklevel=2)
        return make_run_fn(geom, _dc.replace(config, backend="mega4"),
                           timesteps)

    interpret = jax.default_backend() != "tpu"
    dtype = jnp.dtype(config.dtype)
    K = max(2, config.stream_steps - config.stream_steps % 2)
    K = min(K, timesteps - timesteps % 2)
    n_chunks, rem = divmod(timesteps, K)
    rem_even = rem - rem % 2
    tail_odd = rem % 2
    L = geom.layers

    def make_k(k):
        return pallas_stream.make_stream_kernel(
            geom, config.dt, k, coriolis=config.coriolis, dtype=dtype,
            filter_precision=config.filter_precision, interpret=interpret,
            q_limiter=config.q_limiter, pipeline=config.stream_pipeline)

    multi = make_k(K)
    multi_rem = make_k(rem_even) if rem_even else None
    tail_step = (make_dynamics_step(geom, config, None) if tail_odd
                 else None)

    def advance_chunk(state, multi_k, k):
        prog, g, utc, step = state
        packed = pallas_stream.pack_state(*(x.astype(dtype) for x in prog))
        S = jnp.stack([packed, jnp.zeros_like(packed)])
        S = multi_k(S)
        prog_n = PrognosticVars(*pallas_stream.unpack_state(S[0], L))
        return ModelState(prog_n, g, utc + k * config.dt, step + k)

    def tail(state):
        if rem_even:
            state = advance_chunk(state, multi_rem, rem_even)
        if tail_odd:
            state = full_timestep(state, geom, config, None, tail_step)
        return state

    if config.guard:
        def guarded_chunk(carry, chunk_start, chunk_fn):
            state, ok, blown = carry
            new_state = chunk_fn(state)
            bad = state_bad(new_state, config)
            advance = ok & ~bad
            state = jax.tree.map(
                lambda old, new: jnp.where(advance, new, old),
                state, new_state)
            blown = jnp.where(ok & bad, chunk_start, blown)
            return state, advance, blown

        def gbody(carry, idx):
            carry = guarded_chunk(carry, idx * K,
                                  lambda s: advance_chunk(s, multi, K))
            stats = collect_stats(carry[0], geom) if config.stats else None
            return carry, stats

        @functools.partial(jax.jit, donate_argnums=0)
        def run(state):
            carry = (state, jnp.asarray(True),
                     jnp.asarray(-1, dtype=jnp.int32))
            carry, stats = jax.lax.scan(
                gbody, carry, jnp.arange(n_chunks, dtype=jnp.int32))
            extra = []
            if rem_even:
                carry = guarded_chunk(
                    carry, n_chunks * K,
                    lambda s: advance_chunk(s, multi_rem, rem_even))
                if config.stats:
                    extra.append(collect_stats(carry[0], geom))
            if tail_odd:
                carry = guarded_chunk(
                    carry, timesteps - 1,
                    lambda s: full_timestep(s, geom, config, None,
                                            tail_step))
                if config.stats:
                    extra.append(collect_stats(carry[0], geom))
            if config.stats and extra:
                ex = jax.tree.map(lambda *xs: jnp.stack(xs), *extra)
                stats = jax.tree.map(
                    lambda a, b: jnp.concatenate([a, b]), stats, ex)
            state, ok, blown = carry
            return state, stats, GuardInfo(ok, blown)

        return run

    def body(state, _):
        state = advance_chunk(state, multi, K)
        stats = collect_stats(state, geom) if config.stats else None
        return state, stats

    @functools.partial(jax.jit, donate_argnums=0)
    def run(state):
        state, stats = jax.lax.scan(body, state, None, length=n_chunks)
        extra = []
        state = tail(state) if (rem_even or tail_odd) else state
        if config.stats and (rem_even or tail_odd):
            extra.append(collect_stats(state, geom))
        if config.stats and extra:
            ex = jax.tree.map(lambda *xs: jnp.stack(xs), *extra)
            stats = jax.tree.map(
                lambda a, b: jnp.concatenate([a, b]), stats, ex)
        return state, stats

    return run


def make_run_fn(geom, config, timesteps, mesh=None):
    """Build a jitted scan over ``timesteps`` Matsuno steps with donated state.

    Returns ``run(state) -> (state, stats)``; with ``config.guard`` on,
    ``run(state) -> (state, stats, GuardInfo)`` — the scan stops advancing
    (state freezes at the last good step) once a step produces NaNs or an
    out-of-bounds surface pressure, TPU-natively (no host sync per step:
    the guard is a scan-carried flag, the reference's per-step host NaN
    sweep cannot live inside jit).

    With ``mesh`` (a device mesh with a 'y' axis) the dynamics step runs
    the lat-ring decomposition (:func:`make_dynamics_step`); pass a state
    already placed with :func:`gcmiipy_tpu.parallel.mesh
    .ring_state_shardings` — guard reductions, stats and checkpoint
    gathers are plain jnp ops on the sharded arrays, which GSPMD lowers
    to the proper collectives.

    The 'stream' backend (single-device) advances ``config.stream_steps``
    per scan iteration; see :func:`_make_stream_run_fn` for its guard and
    stats granularity.
    """
    if config.backend == "stream" and mesh is None:
        return _make_stream_run_fn(geom, config, timesteps)
    if mesh is not None and config.polar_filter == "fft" \
            and config.backend == "xla":
        # under a sharded mesh the zonal rFFT is the one op GSPMD handles
        # badly (resharding collectives; XLA's CPU fft thunk also rejects
        # non-major sharded layouts outright) — the shared-matrix DFT
        # matmul is the decomposition-friendly exact-same-mask form
        # (SURVEY.md section 5.7)
        import dataclasses as _dc
        config = _dc.replace(config, polar_filter="dft")
    filter_fn = make_filter_fn(config, geom)
    dynamics_step = make_dynamics_step(geom, config, filter_fn, mesh=mesh)

    def body(state, _):
        state = full_timestep(state, geom, config, filter_fn, dynamics_step)
        stats = collect_stats(state, geom) if config.stats else None
        return state, stats

    def guarded_body(carry, step_idx):
        # NOTE: step_idx restarts per checkpoint chunk (used only for the
        # blown-step report); the Shapiro cadence uses state.step, which
        # carries globally
        state, ok, blown = carry
        new_state = full_timestep(state, geom, config, filter_fn,
                                  dynamics_step)
        bad = state_bad(new_state, config)
        advance = ok & ~bad
        state = jax.tree.map(
            lambda old, new: jnp.where(advance, new, old), state, new_state)
        blown = jnp.where(ok & bad, step_idx, blown)
        stats = collect_stats(state, geom) if config.stats else None
        return (state, advance, blown), stats

    if config.guard:
        @functools.partial(jax.jit, donate_argnums=0)
        def run(state):
            carry0 = (state, jnp.asarray(True),
                      jnp.asarray(-1, dtype=jnp.int32))
            (state, ok, blown), stats = jax.lax.scan(
                guarded_body, carry0,
                jnp.arange(timesteps, dtype=jnp.int32))
            return state, stats, GuardInfo(ok, blown)
    else:
        @functools.partial(jax.jit, donate_argnums=0)
        def run(state):
            return jax.lax.scan(body, state, None, length=timesteps)

    return run


def gen_model_state(geom, config) -> ModelState:
    """Initial state incl. the reference's driver-level tweaks
    (``run_model`` sets u = 0 and seeds v[0,0,0] = 0.1,
    reference no_limits_2_5d.py:224-226)."""
    dtype = jnp.dtype(config.dtype)
    prog, ground = gen_initial_conditions(geom, dtype=dtype)
    u = jnp.zeros_like(prog.u)
    v = prog.v.at[0, 0, 0].set(0.1)
    prog = prog._replace(u=u, v=v)
    if config.gw0 > 0:
        # seed the ground-water reservoir so evaporation has something to
        # draw on (the reference initializes gw = 0)
        ground = ground._replace(gw=jnp.full_like(ground.gw, config.gw0))
    return ModelState(prog, ground, jnp.asarray(0.0, dtype),
                      jnp.asarray(0, jnp.int32))


def _stack_stats(chunks):
    """Concatenate per-chunk stacked StepStats along the step axis."""
    chunks = [c for c in chunks if c is not None]
    if not chunks:
        return None
    return jax.tree.map(lambda *xs: np.concatenate([np.asarray(x)
                                                    for x in xs]), *chunks)


def _log_metrics(config, stats, n_steps=None):
    if not (config.metrics_path and stats is not None):
        return
    from gcmiipy_tpu.model.observability import MetricsLogger
    logger = MetricsLogger(config.metrics_path)
    host = jax.device_get(stats)
    # row count from the stats themselves: the 'stream' backend collects
    # one entry per stream_steps chunk, not per step
    n = len(np.asarray(host.total_energy))
    if n_steps is not None:
        n = min(n, n_steps) if n > n_steps else n
    for i in range(n):
        logger.log(i, **{k: getattr(host, k)[i] for k in StepStats._fields})
    logger.close()


def run_model(height, width, layers, dt, timesteps, callback=None,
              config: ModelConfig = None, mesh=None):
    """Reference-compatible entry point (reference no_limits_2_5d.py:220-236).

    Returns (p, u, v, t, q, ground, geom, stats).  With ``callback`` the run
    is a Python loop over a jitted single step (callback gets (p,u,v,t,q)
    per step); otherwise the whole run is one compiled scan — chunked every
    ``config.checkpoint_every`` steps when ``config.checkpoint_dir`` is set,
    with a checkpoint written after each chunk.  With ``config.guard`` on, a
    run that blows up (NaNs / pressure out of bounds) stops advancing and a
    RuntimeWarning names the first bad step.

    With ``mesh`` (a device mesh with a 'y' latitude axis) the run is
    decomposed over the latitude ring: the state is placed with
    :func:`gcmiipy_tpu.parallel.mesh.ring_state_shardings`, fused backends
    run the explicit-halo lat-ring kernel, and guard/stats/checkpointing
    work exactly as on one device (their reductions become collectives).
    """
    if config is None:
        config = ModelConfig(height=height, width=width, layers=layers, dt=dt)
    else:
        import dataclasses
        config = dataclasses.replace(
            config, height=height, width=width, layers=layers, dt=dt)

    if config.giss_sige:
        geom = geometry.gen_geometry(
            height, width, layers, sige_table=geometry.GISS_SIGE,
            ptop=config.ptop or 1000.0)
    else:
        geom = geometry.gen_geometry(height, width, layers,
                                     sig_func=config.sig_func,
                                     ptop=config.ptop)
    geom = geom.astype(np.dtype(config.dtype))
    state = gen_model_state(geom, config)
    if mesh is not None:
        if callback is not None:
            raise ValueError("mesh runs use the compiled scan path; "
                             "callback is not supported")
        from gcmiipy_tpu.parallel import mesh as mesh_mod
        state = jax.device_put(state, mesh_mod.ring_state_shardings(mesh))

    def warn_blown(guard_info, base_step=0):
        if guard_info is not None and not bool(guard_info.ok):
            import warnings
            causes = ("NaN or surface pressure out of "
                      f"[{config.guard_p_min}, {config.guard_p_max}] Pa")
            if config.guard_t_max > 0 or config.guard_t_min > 0:
                causes += (" or potential temperature out of "
                           f"[{config.guard_t_min}, "
                           f"{config.guard_t_max or float('inf')}] K")
            warnings.warn(
                f"run blew up ({causes}) at step "
                f"{base_step + int(guard_info.blown_step)}; state frozen at "
                "the last good step", RuntimeWarning, stacklevel=3)
            return True
        return False

    checkpointing = config.checkpoint_dir and config.checkpoint_every > 0
    if callback is None and checkpointing:
        from gcmiipy_tpu.model.checkpoint import save_checkpoint
        every = config.checkpoint_every
        run_chunk = make_run_fn(geom, config, every, mesh=mesh)
        stats_chunks = []
        done = 0
        while done < timesteps:
            n = min(every, timesteps - done)
            run_n = (run_chunk if n == every
                     else make_run_fn(geom, config, n, mesh=mesh))
            out = run_n(state)
            state, stats_c = out[0], out[1]
            stats_chunks.append(jax.device_get(stats_c)
                                if config.stats else None)
            done += n
            # on a blown chunk the state froze at the last good step — stamp
            # the checkpoint with THAT step so restore_checkpoint's
            # filename-derived step counter matches the frozen state
            blown = config.guard and not bool(out[2].ok)
            good_step = done - n + int(out[2].blown_step) if blown else done
            save_checkpoint(config.checkpoint_dir, state, good_step)
            if blown and warn_blown(out[2], done - n):
                break
        stats = _stack_stats(stats_chunks)
        _log_metrics(config, stats, done)
        prog, ground = state.prog, state.ground
        return (prog.p, prog.u, prog.v, prog.t, prog.q, ground, geom, stats)

    if callback is None:
        run = make_run_fn(geom, config, timesteps, mesh=mesh)
        out = run(state)
        state, stats = out[0], out[1]
        if config.guard:
            warn_blown(out[2])
        _log_metrics(config, stats, timesteps)
    else:
        filter_fn = make_filter_fn(config, geom)
        dynamics_step = make_dynamics_step(geom, config, filter_fn)
        step = jax.jit(lambda s: full_timestep(s, geom, config, filter_fn,
                                               dynamics_step))
        stats_list = []
        for _ in range(timesteps):
            state = step(state)
            if config.stats:
                stats_list.append(jax.device_get(collect_stats(state, geom)))
            prog = state.prog
            callback(prog.p, prog.u, prog.v, prog.t, prog.q)
        stats = (jax.tree.map(lambda *xs: np.stack(xs), *stats_list)
                 if stats_list else None)

    prog, ground = state.prog, state.ground
    return prog.p, prog.u, prog.v, prog.t, prog.q, ground, geom, stats
