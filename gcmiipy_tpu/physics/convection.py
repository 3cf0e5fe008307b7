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

import jax.numpy as jnp

from gcmiipy_tpu import constants

CRITICAL_LAPSE = 0.0065  # K/m (Manabe & Strickler 1964)


def convective_adjustment(tt, tp, dp, critical_lapse=CRITICAL_LAPSE,
                          sweeps=None):
    """Adjust true temperature ``tt`` [k,j,i] toward the critical lapse.

    ``tp``: mid-layer pressure [k,j,i] (or broadcastable); ``dp``: layer
    mass weights (p * dsig).  Returns the adjusted ``tt``; column enthalpy
    ``sum_k Cp * tt * dp`` is conserved exactly (up to float rounding) and
    no stable pair is modified.
    """
    L = tt.shape[0]
    if L < 2:
        return tt
    if sweeps is None:
        sweeps = 2 * L

    tp = jnp.broadcast_to(jnp.asarray(tp, tt.dtype), tt.shape)
    dp = jnp.broadcast_to(jnp.asarray(dp, tt.dtype), tt.shape)

    # per-interface geometric factors are recomputed from the running
    # temperatures (dz depends weakly on Tbar)
    def pair(t_dn, t_up, p_dn, p_up, m_dn, m_up):
        tbar = 0.5 * (t_dn + t_up)
        dz = constants.Rd * tbar / constants.G * jnp.log(p_dn / p_up)
        D = critical_lapse * dz
        unstable = t_up < t_dn - D
        t_dn_new = (m_dn * t_dn + m_up * t_up + m_up * D) / (m_dn + m_up)
        t_up_new = t_dn_new - D
        return (jnp.where(unstable, t_dn_new, t_dn),
                jnp.where(unstable, t_up_new, t_up))

    layers = [tt[k] for k in range(L)]
    ps = [tp[k] for k in range(L)]
    ms = [dp[k] for k in range(L)]
    for _ in range(sweeps):
        for k in range(L - 1):            # bottom-up sweep
            layers[k], layers[k + 1] = pair(layers[k], layers[k + 1],
                                            ps[k], ps[k + 1],
                                            ms[k], ms[k + 1])
    return jnp.stack(layers, axis=0)
