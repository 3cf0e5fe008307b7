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


def make_dynamics_step(geom, config, filter_fn):
    """Select the stencil backend: plain XLA, the fused Pallas half-step
    kernel, or the mega-kernel (filter fused in-VMEM)."""
    if config.backend in ("fused", "mega", "mega4"):
        from gcmiipy_tpu.dynamics import fused
        return fused.make_fused_step(
            geom, config.dt, coriolis=config.coriolis,
            dtype=jnp.dtype(config.dtype), filter_fn=filter_fn,
            pipeline="v1" if config.backend == "fused" else config.backend,
            filter_precision=config.filter_precision)
    return lambda *s: core25d.matsuno_timestep(
        *s, config.dt, geom, filter_fn=filter_fn, coriolis=config.coriolis)


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
                fields=config.shapiro_fields)

        p, t = jax.lax.cond(due, smooth, lambda ops: ops, (p, t))
    if config.physics:
        t, g = solar_timestep(t, p, g, config.dt, utc, geom, config)
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


def make_run_fn(geom, config, timesteps):
    """Build a jitted scan over ``timesteps`` Matsuno steps with donated state.

    Returns ``run(state) -> (state, stats)``; with ``config.guard`` on,
    ``run(state) -> (state, stats, GuardInfo)`` — the scan stops advancing
    (state freezes at the last good step) once a step produces NaNs or an
    out-of-bounds surface pressure, TPU-natively (no host sync per step:
    the guard is a scan-carried flag, the reference's per-step host NaN
    sweep cannot live inside jit).
    """
    filter_fn = make_filter_fn(config, geom)
    dynamics_step = make_dynamics_step(geom, config, filter_fn)

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
    return ModelState(prog, ground, jnp.asarray(0.0, dtype),
                      jnp.asarray(0, jnp.int32))


def _stack_stats(chunks):
    """Concatenate per-chunk stacked StepStats along the step axis."""
    chunks = [c for c in chunks if c is not None]
    if not chunks:
        return None
    return jax.tree.map(lambda *xs: np.concatenate([np.asarray(x)
                                                    for x in xs]), *chunks)


def _log_metrics(config, stats, n_steps):
    if not (config.metrics_path and stats is not None):
        return
    from gcmiipy_tpu.model.observability import MetricsLogger
    logger = MetricsLogger(config.metrics_path)
    host = jax.device_get(stats)
    for i in range(n_steps):
        logger.log(i, **{k: getattr(host, k)[i] for k in StepStats._fields})
    logger.close()


def run_model(height, width, layers, dt, timesteps, callback=None,
              config: ModelConfig = None):
    """Reference-compatible entry point (reference no_limits_2_5d.py:220-236).

    Returns (p, u, v, t, q, ground, geom, stats).  With ``callback`` the run
    is a Python loop over a jitted single step (callback gets (p,u,v,t,q)
    per step); otherwise the whole run is one compiled scan — chunked every
    ``config.checkpoint_every`` steps when ``config.checkpoint_dir`` is set,
    with a checkpoint written after each chunk.  With ``config.guard`` on, a
    run that blows up (NaNs / pressure out of bounds) stops advancing and a
    RuntimeWarning names the first bad step.
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
        run_chunk = make_run_fn(geom, config, every)
        stats_chunks = []
        done = 0
        while done < timesteps:
            n = min(every, timesteps - done)
            run_n = run_chunk if n == every else make_run_fn(geom, config, n)
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
        run = make_run_fn(geom, config, timesteps)
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
