"""Dry convective adjustment (Manabe & Strickler 1964).

BEYOND-REFERENCE capability (off by default): the reference computes grey
radiation but has no convection scheme at all — radiative heating of its
isothermal initial state eventually super-adiabatically destabilizes the
column and trips the pressure guard (measured: step ~6308 of the 8x8x3
dt=1800 s flagship run).  The classic fix, used alongside exactly this
kind of grey radiation in the radiative-convective equilibrium literature
the reference's Manabe helpers come from (``humidity.manabe_rh``,
``grey_solar.daily_average_irradiance``), is to relax any column whose
lapse rate exceeds a critical 6.5 K/km back to the critical profile while
conserving column enthalpy.

Implementation: iterative pairwise adjustment over adjacent sigma layers
(k = 0 is the surface layer).  For an unstable pair, both temperatures
move to the unique enthalpy-conserving critical profile:

    T_up = T_dn - gamma * dz,   dz = (Rd * Tbar / g) * ln(p_dn / p_up)

Everything is column-local elementwise jnp (vmaps over the horizontal
grid for free) with statically unrolled sweeps — jit/Pallas friendly.
"""

import jax
import jax.numpy as jnp

from gcmiipy_tpu import constants

CRITICAL_LAPSE = 0.0065  # K/m (Manabe & Strickler 1964)


def convective_adjustment(tt, tp, dp, critical_lapse=CRITICAL_LAPSE,
                          sweeps=None, adaptive=True):
    """Adjust true temperature ``tt`` [k,j,i] toward the critical lapse.

    ``tp``: mid-layer pressure [k,j,i] (or broadcastable); ``dp``: layer
    mass weights (p * dsig).  Returns the adjusted ``tt``; column enthalpy
    ``sum_k Cp * tt * dp`` is conserved exactly (up to float rounding) and
    no stable pair is modified.

    ``adaptive=True`` wraps the sweeps in a ``lax.while_loop`` that exits
    once a full sweep changed nothing (capped at ``sweeps``): the same
    fixed point as the fixed-sweep form — a sweep over a converged field
    is the identity — to FMA-contraction rounding (XLA contracts
    multiply-adds differently inside a while body than in the unrolled
    graph; measured 4e-13 on f64 columns).  Steady-state columns (the
    common case after the first cadence points of a run) pay ~2 sweeps
    instead of 2L.  ``adaptive=False`` keeps the statically unrolled
    form (Pallas-kernel friendly: no while_loop inside kernels).
    """
    L = tt.shape[0]
    if L < 2:
        return tt
    if sweeps is None:
        sweeps = 2 * L

    tp = jnp.broadcast_to(jnp.asarray(tp, tt.dtype), tt.shape)
    dp = jnp.broadcast_to(jnp.asarray(dp, tt.dtype), tt.shape)

    ps = [tp[k] for k in range(L)]
    ms = [dp[k] for k in range(L)]
    # temperature-INDEPENDENT per-interface factors, hoisted out of the
    # sweep loop: log(p ratio) and the pair-mass reciprocal do not change
    # across sweeps, and log/div are the expensive multi-pass VPU ops —
    # recomputing them 2L*(L-1) times dominated the physics step cost
    # (measured: the hoist cuts the flagship convection share ~5x)
    log_ratio = [jnp.log(ps[k] / ps[k + 1]) for k in range(L - 1)]
    inv_mass = [1.0 / (ms[k] + ms[k + 1]) for k in range(L - 1)]

    # per-interface dz is recomputed from the running temperatures each
    # sweep (dz depends weakly on Tbar)
    def pair(k, t_dn, t_up):
        tbar = 0.5 * (t_dn + t_up)
        dz = constants.Rd * tbar / constants.G * log_ratio[k]
        D = critical_lapse * dz
        unstable = t_up < t_dn - D
        t_dn_new = (ms[k] * t_dn + ms[k + 1] * t_up
                    + ms[k + 1] * D) * inv_mass[k]
        t_up_new = t_dn_new - D
        return (jnp.where(unstable, t_dn_new, t_dn),
                jnp.where(unstable, t_up_new, t_up),
                unstable)

    if not adaptive:
        layers = [tt[k] for k in range(L)]
        for _ in range(sweeps):
            for k in range(L - 1):        # bottom-up sweep
                layers[k], layers[k + 1], _ = pair(k, layers[k],
                                                   layers[k + 1])
        return jnp.stack(layers, axis=0)

    def sweep(carry):
        t, i, _ = carry
        layers = [t[k] for k in range(L)]
        touched = jnp.zeros((), bool)
        for k in range(L - 1):            # bottom-up sweep
            layers[k], layers[k + 1], unstable = pair(k, layers[k],
                                                      layers[k + 1])
            touched = touched | jnp.any(unstable)
        return jnp.stack(layers, axis=0), i + 1, touched

    def cond(carry):
        _, i, touched = carry
        return (i < sweeps) & touched

    out, _, _ = jax.lax.while_loop(cond, sweep,
                                   (tt, jnp.zeros((), jnp.int32),
                                    jnp.ones((), bool)))
    return out
