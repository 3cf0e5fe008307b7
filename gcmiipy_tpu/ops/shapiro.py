"""N-th order Shapiro filter in the zonal direction (GCM-II FILTER/SHAP1D).

The original GCM-II smooths selected prognostics zonally with an 8th-order
Shapiro filter every few hours; in the reference both subroutines are
docstring-only stubs (``port.py:566-583`` FILTER "8-TH ORDER SHAPIRO FILTER
ON SELECTED PROGNOSTIC QUANTITIES IN THE ZONAL DIRECTION", MFILTR field
selection; ``port.py:585-590`` SHAP1D).  This implements them: the order-n
filter (n even) is

    S_n x = x - (-1)^(n/2) F^(n/2) x,      F x = (x_{i+1} - 2 x_i + x_{i-1})/4

with periodic longitude.  Its spectral response is 1 - sin^n(k dx / 2):
the 2-grid-length wave is removed exactly, well-resolved scales pass nearly
untouched (order 8 damps a 4 dx wave by ~6% per pass), and the zonal mean
of every row is conserved to roundoff.  Shapiro (1970), "Smoothing,
filtering, and boundary effects", Rev. Geophys. 8(2).

GCM-II's FILTER smooths *sea-level* pressure (MFILTR=1 "SMOOTH P USING SEA
LEVEL PRESSURE FILTER"): over topography the surface pressure carries a
static orographic signal (low p over mountains) that a raw zonal smoother
would diffuse into spurious mass redistribution; reducing to sea level
first makes the filter act on the meteorological signal only.
``filter_prognostics(..., slp=True)`` implements the reduction with the
barometric factor ``exp(g z / (R_d T_1))`` from the lowest-layer true
temperature (the GCM-II approach); ``slp=False`` (default) filters raw
``p`` — over flat terrain the two are identical, see
``tests/test_shapiro.py``.

The MFILTR=2 temperature counterpart ("TROPOSPHERIC STRATIFICATION OF
TEMPER") subtracts a zonally-uniform reference stratification before
smoothing.  The Shapiro filter is linear and annihilates zonal constants,
so subtracting ANY longitude-independent reference profile changes nothing:
``S(t - ref) + ref == S(t)`` exactly.  The only effect such machinery could
have is through a longitude-DEPENDENT reference (values interpolated to
constant-pressure surfaces over varying surface pressure); GCM-II's own
correction is the σ→p interpolation, which is deliberately descoped here:
the reference repo stubs FILTER entirely, and on-σ smoothing of θ is the
documented, tested behavior.
"""

import jax.numpy as jnp


def shap1d(x, order=8, axis=-1):
    """Apply the order-``order`` Shapiro filter along ``axis`` (periodic).

    ``order`` must be a positive even integer; the filter is ``order/2``
    applications of the scaled second difference with alternating sign
    folded into a single correction term (see module docstring).
    """
    if order <= 0 or order % 2:
        raise ValueError(f"Shapiro order must be positive and even, got {order}")
    half = order // 2
    d = x
    for _ in range(half):
        d = (jnp.roll(d, -1, axis) - 2 * d + jnp.roll(d, 1, axis)) * 0.25
    sign = -1.0 if half % 2 else 1.0
    return x - sign * d


def slp_factor(p, t, geom):
    """Barometric sea-level reduction factor ``exp(g z / (R_d T_1))``.

    ``T_1`` is the true temperature of the lowest model layer (k = 0; sigma
    decreases upward in this framework, `grid/geometry.py`), the GCM-II
    FILTER's temperature choice for the reduction.  Over ocean (z = 0) the
    factor is exactly 1.
    """
    from gcmiipy_tpu import constants
    from gcmiipy_tpu.physics import thermo

    sig0 = jnp.asarray(geom.sig, t.dtype).reshape(-1)[0]
    ptop = jnp.asarray(geom.ptop, t.dtype)
    heightmap = jnp.asarray(geom.heightmap, t.dtype)
    tp_low = p * sig0 + ptop
    tt_low = thermo.to_true_temp(t[0], tp_low)
    return jnp.exp(constants.G * heightmap / (constants.Rd * tt_low))


def filter_prognostics(p, t, order=8, fields="p", slp=False, geom=None):
    """GCM-II FILTER: smooth surface pressure and/or potential temperature
    zonally (``port.py:566-576``; MFILTR=1 -> p, 2 -> t, 3 -> both).

    With ``slp=True`` (requires ``geom``) the pressure is reduced to sea
    level before smoothing and restored after — the GCM-II behavior over
    topography (see module docstring); a pressure field in exact barometric
    balance with the terrain passes through untouched.  ``slp=False``
    smooths raw ``p`` (identical over flat terrain).  ``t`` is smoothed on
    σ-surfaces either way (see module docstring for why the
    zonal-reference stratification reduction is a filter no-op).

    Returns ``(p, t)`` with the selected fields filtered.
    """
    if fields not in ("p", "t", "pt"):
        raise ValueError(f"shapiro fields must be 'p', 't' or 'pt', "
                         f"got {fields!r}")
    if "p" in fields:
        if slp:
            if geom is None:
                raise ValueError("slp=True needs geom (heightmap/sig/ptop)")
            ptop = jnp.asarray(geom.ptop, p.dtype)
            factor = slp_factor(p, t, geom)
            psl = (p + ptop) * factor
            p = shap1d(psl, order=order) / factor - ptop
        else:
            p = shap1d(p, order=order)
    if "t" in fields:
        t = shap1d(t, order=order)
    return p, t
