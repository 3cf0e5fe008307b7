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


def filter_prognostics(p, t, order=8, fields="p"):
    """GCM-II FILTER: smooth surface pressure and/or potential temperature
    zonally (``port.py:566-576``; MFILTR=1 -> p, 2 -> t, 3 -> both).

    Returns ``(p, t)`` with the selected fields filtered.  The original
    filters sea-level pressure / stratification-adjusted temperature;
    without the reduction-to-sea-level machinery (not in the reference)
    the raw fields are filtered — same role, documented deviation.
    """
    if fields not in ("p", "t", "pt"):
        raise ValueError(f"shapiro fields must be 'p', 't' or 'pt', "
                         f"got {fields!r}")
    if "p" in fields:
        p = shap1d(p, order=order)
    if "t" in fields:
        t = shap1d(t, order=order)
    return p, t
