"""Static grid geometry descriptor.

JAX-native twin of the reference ``geometry.py``: the :class:`Geom` dataclass
carries the sigma ladder, the per-latitude grid spacings, cell areas and the
surface heightmap for a lat-lon C-grid with sigma vertical coordinates
(reference ``geometry.py:9-27``).

Differences from the reference, by design:

* ``Geom`` is a frozen dataclass registered as a JAX pytree: geometry arrays
  ride into ``jit``-compiled step functions as ordinary leaves while the grid
  dimensions stay static.
* Geometry is generated host-side in float64 NumPy and cast to the working
  dtype with :meth:`Geom.astype` (f32 on TPU, f64 for oracle runs).
* ``area`` is stored with shape ``(height, 1)`` so it broadcasts correctly
  against ``[k, j, i]`` fields.  The reference keeps it 1-D (``geometry.py:141``)
  which only broadcasts on square grids.
* The zonal low-pass damping mask of the polar filter (reference
  ``low_pass.py:64-71``) is static per geometry, so it is precomputed here
  (``polar_mask``) instead of being rebuilt every call.
"""

import dataclasses
import math

import jax
import numpy as np

from gcmiipy_tpu import constants


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Geom:
    """Static descriptor of the model grid (reference geometry.py:9-27)."""

    # Static grid dimensions
    height: int = dataclasses.field(metadata=dict(static=True))   # J: latitudes
    width: int = dataclasses.field(metadata=dict(static=True))    # I: longitudes
    layers: int = dataclasses.field(metadata=dict(static=True))   # K: sigma layers

    # Sigma ladder, shaped (L+1,1,1) / (L,1,1) to broadcast over [k,j,i]
    sige: np.ndarray   # layer edges, 1 at surface -> 0 at top (geometry.py:79)
    sigt: np.ndarray   # top edge of each layer (geometry.py:80)
    sigb: np.ndarray   # bottom edge of each layer (geometry.py:81)
    dsig: np.ndarray   # sigb - sigt (geometry.py:83)
    sig: np.ndarray    # layer midpoint (geometry.py:84)
    dsigv: np.ndarray  # midpoint-to-midpoint spacing (geometry.py:85)

    # Horizontal geometry
    lat: np.ndarray    # cell-center latitude [rad], shape (J, 1) (geometry.py:107)
    lat_h: np.ndarray  # southern-edge latitude [rad], shape (J, 1)
    long: np.ndarray   # cell-center longitude [rad], shape (I,) (geometry.py:108)
    dx_j: np.ndarray   # zonal spacing at cell rows, shape (1, J, 1) (geometry.py:136)
    dx_h: np.ndarray   # zonal spacing at v rows, shape (1, J, 1) (geometry.py:137)
    dy: np.ndarray     # meridional spacing, scalar (geometry.py:138)
    area: np.ndarray   # trapezoid cell area, shape (J, 1) (geometry.py:141)

    ptop: np.ndarray       # pressure at sigma=0 top, scalar (geometry.py:147)
    heightmap: np.ndarray  # surface elevation [m], shape (J, I) (geometry.py:149)
    # Land fraction in [0, 1], shape (J, I): 0 = open ocean.  The reference
    # decodes the Hansen land-cover map but consumes it nowhere
    # (hansen_topography.py:11-51); here it couples into surface albedo
    # and evaporation availability when ModelConfig.land_cover enables it.
    land_fraction: np.ndarray

    # Zonal damping mask for the Arakawa-Lamb polar filter, shape (J, I//2+1).
    # mask==1 everywhere the row needs no filtering (low_pass.py:64-71).
    polar_mask: np.ndarray

    def astype(self, dtype):
        """Return a copy with every array field cast to ``dtype``."""
        def cast(x):
            return np.asarray(x, dtype=dtype)
        return dataclasses.replace(
            self,
            **{
                f.name: cast(getattr(self, f.name))
                for f in dataclasses.fields(self)
                if not f.metadata.get("static", False)
            },
        )


# ---------------------------------------------------------------------------
# Sigma spacing functions (reference geometry.py:30-35)
# ---------------------------------------------------------------------------

def manabe_sig(s):
    """Manabe sigma spacing: sigma^2 (3 - 2 sigma) (reference geometry.py:30)."""
    return s ** 2 * (3 - 2 * s)


def equal_sig(s):
    """Uniform sigma spacing (reference geometry.py:34)."""
    return s


# The GISS GCM-II 9-layer SIGE table (reference geometry.py:45)
GISS_SIGE = np.asarray(
    [1., .948665, .866530, .728953, .554415, .390144, .251540, .143737, .061602, 0.]
)


def _sigma_ladder(layers, sig_func, sige_table=None):
    """Build the (L+1,) edge ladder and derived (L,1,1) arrays.

    ``sige_table``: explicit (L+1,) edge values (1 at surface -> 0 at top),
    e.g. :data:`GISS_SIGE` — takes precedence over ``sig_func``.
    """
    if sige_table is not None:
        mysig = np.asarray(sige_table, dtype=np.float64)
        if mysig.shape != (layers + 1,):
            raise ValueError(
                f"sige_table must have {layers + 1} edges, got {mysig.shape}")
        if mysig[0] != 1.0 or mysig[-1] != 0.0 or (np.diff(mysig) >= 0).any():
            raise ValueError("sige_table must decrease from 1 to 0")
    else:
        mysig = np.asarray(
            [sig_func(1 - i / layers) for i in range(layers + 1)],
            dtype=np.float64)

    def rs(arr):
        return np.reshape(arr, (arr.shape[0], 1, 1))

    sige = rs(mysig)
    sigt = rs(mysig[1:])
    sigb = rs(mysig[:-1])
    dsig = sigb - sigt
    sig = (sigb + sigt) / 2
    dsigv = np.roll(sig, -1, axis=0) - sig
    return sige, sigt, sigb, dsig, sig, dsigv


def _polar_mask(width, dy, dx_j):
    """Arakawa & Lamb 1977 zonal damping mask (reference low_pass.py:61-73).

    Returns shape (J, width//2+1): multiplier per latitude row and zonal
    wavenumber for the rFFT spectrum.  Wavenumber n is damped wherever
    1/sin(pi n / I) exceeds dy/dx_j, i.e. near the poles where the cells
    narrow.  Row-independent of the field being filtered.
    """
    height = dx_j.shape[0]
    nfreq = width // 2 + 1
    if width == 1:
        return np.ones((height, 1), dtype=np.float64)
    n = np.arange(1, nfreq)  # zonal wavenumbers 1..I//2
    bysn = 1.0 / np.sin(np.pi * n / width)                  # (nfreq-1,)
    drat = (dy / dx_j)[:, None]                             # (J, 1)
    sm = 1.0 - bysn[None, :] / drat                         # (J, nfreq-1)
    smmz = 1.0 - np.maximum(sm, 0.0)
    return np.concatenate([np.ones((height, 1)), smmz], axis=1)


def gen_geometry(height, width, layers, sig_func=equal_sig,
                 north_edge=90.0, south_edge=-90.0,
                 west_edge=-180.0, east_edge=180.0,
                 heightmap=None, ptop=0.0, sige_table=None,
                 land_fraction=None):
    """Spherical lat-lon geometry (reference geometry.py:38-151).

    Latitude rows run from north to south: ``lat[j] = north - (j+.5) dlat``
    (reference geometry.py:99), so increasing j moves southward.

    ``sige_table`` builds the vertical ladder from explicit edges instead
    of ``sig_func`` — pass :data:`GISS_SIGE` (with ``layers=9``,
    ``ptop=1000.0``) for the historical GCM-II grid (reference
    geometry.py:45; PTOP = 10 mb per port_BAjal.py:58).
    """
    sige, sigt, sigb, dsig, sig, dsigv = _sigma_ladder(layers, sig_func,
                                                       sige_table)

    circumference = 2 * math.pi * constants.radius
    dlat = (north_edge - south_edge) / height
    dlong = (east_edge - west_edge) / width

    j = np.arange(height, dtype=np.float64)
    lat_j = north_edge - (j + 0.5) * dlat     # cell centers (geometry.py:99)
    lat_h = north_edge - (j + 1.0) * dlat     # southern edges (geometry.py:100)
    long_k = west_edge + (np.arange(width, dtype=np.float64) + 0.5) * dlong

    cos_j = np.cos(np.deg2rad(lat_j))
    cos_h = np.cos(np.deg2rad(lat_h))
    dx_j_row = cos_j * circumference / width   # (geometry.py:114)
    dx_h_row = cos_h * circumference / width   # (geometry.py:115)
    dy = circumference / 2 / height            # (geometry.py:138)

    # Trapezoid cell areas (geometry.py:141); kept (J,1) for broadcasting.
    area = (np.roll(dx_h_row, 1) + dx_h_row) * dy * 0.5

    if heightmap is None:
        heightmap = np.zeros((height, width), dtype=np.float64)
    if land_fraction is None:
        land_fraction = np.zeros((height, width), dtype=np.float64)

    return Geom(
        height=height, width=width, layers=layers,
        sige=sige, sigt=sigt, sigb=sigb, dsig=dsig, sig=sig, dsigv=dsigv,
        lat=np.deg2rad(lat_j).reshape(height, 1),
        lat_h=np.deg2rad(lat_h).reshape(height, 1),
        long=np.deg2rad(long_k),
        dx_j=dx_j_row.reshape(1, height, 1),
        dx_h=dx_h_row.reshape(1, height, 1),
        dy=np.float64(dy),
        area=area.reshape(height, 1),
        ptop=np.float64(ptop),
        heightmap=np.asarray(heightmap, dtype=np.float64),
        land_fraction=np.asarray(land_fraction, dtype=np.float64),
        polar_mask=_polar_mask(width, dy, dx_j_row),
    )


def gen_square_geometry(height, width, layers, dx, dy, sig_func=equal_sig,
                        ptop=0.0):
    """Cartesian doubly-periodic geometry (reference geometry.py:154-182)."""
    sige, sigt, sigb, dsig, sig, dsigv = _sigma_ladder(layers, sig_func)

    dx_j = np.full((1, height, 1), float(dx), dtype=np.float64)
    area = np.full((height, 1), float(dx) * float(dy), dtype=np.float64)

    return Geom(
        height=height, width=width, layers=layers,
        sige=sige, sigt=sigt, sigb=sigb, dsig=dsig, sig=sig, dsigv=dsigv,
        lat=np.zeros((height, 1)),
        lat_h=np.zeros((height, 1)),
        long=np.zeros((width,)),
        dx_j=dx_j,
        dx_h=dx_j.copy(),
        dy=np.float64(dy),
        area=area,
        ptop=np.float64(ptop),
        heightmap=np.zeros((height, width), dtype=np.float64),
        land_fraction=np.zeros((height, width), dtype=np.float64),
        polar_mask=_polar_mask(width, float(dy), dx_j[0, :, 0]),
    )


def pressure_from_heightmap(height, sea_level_pressure, sea_level_temp):
    """Barometric surface pressure from elevation (reference geometry.py:185-233).

    Uses the isothermal barometric formula, the variant the reference
    actually returns (``geometry.py:228,233``).
    """
    return sea_level_pressure * np.exp(
        (-constants.G * constants.Md * height) / (constants.R * sea_level_temp)
    )
