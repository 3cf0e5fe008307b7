"""Run configuration dataclasses.

The reference configures runs via module-level constants and hard-coded
``main()`` bodies (reference ``no_limits_2_5d.py:123-126,256-268``; SURVEY.md
section 5.6).  Here configuration is a frozen dataclass consumed by the
driver; every field is static w.r.t. jit.
"""

import dataclasses
from typing import Callable, Optional

from gcmiipy_tpu.grid import geometry


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Configuration of a 2.5D model run."""

    # Grid (reference defaults no_limits_2_5d.py:123-126: 24 x 36 x 9)
    height: int = 24
    width: int = 36
    layers: int = 9
    sig_func: Callable = geometry.manabe_sig
    # Historical GCM-II vertical ladder (reference geometry.py:45): use the
    # explicit GISS_SIGE edge table instead of sig_func, with the matching
    # PTOP = 10 mb (port_BAjal.py:58).  Requires layers=9.
    giss_sige: bool = False
    ptop: float = 0.0  # model-top pressure [Pa]; giss_sige forces 1000.0

    # Terrain: 'flat' (reference default — every driver run uses a zero
    # heightmap) or 'hansen' — the Hansen 1983 topography the reference
    # decodes but never threads into a run (hansen_topography.py:53-96):
    # the map is resampled to the grid, fed to gen_geometry, and the
    # initial surface pressure is barometrically balanced against it
    # (geometry.pressure_from_heightmap, reference geometry.py:185-234)
    # at ``sea_level_temp``.
    topography: str = "flat"
    sea_level_temp: float = 288.0   # [K] for the barometric p init

    # Land cover: 'none' or 'hansen' — couples the Hansen land-fraction
    # map (decoded but consumed by NOTHING in the reference,
    # hansen_topography.py:11-51) into the surface: albedo blends from
    # ``albedo`` (ocean) to ``albedo_land``, and evaporation availability
    # becomes beta=1 over ocean / soil-wetness-limited over land.
    land_cover: str = "none"
    albedo_land: float = 0.35

    # Time stepping (reference main(): dt = 30 min, no_limits_2_5d.py:263)
    dt: float = 1800.0

    # Physics step: the reference computes it but short-circuits before
    # applying it (early return, no_limits_2_5d.py:94).  False reproduces
    # the reference; True enables the grey-radiation column physics.
    physics: bool = False

    # Cadence of the physics extras (radiation/convection/evaporation +
    # surface drag) in dynamics steps: they apply every ``physics_every``
    # steps with an effective timestep of ``physics_every * dt`` — the
    # GCM-II practice of calling radiation less often than dynamics.
    # 1 (default) = every step, the reference's (dead-code) semantics.
    # Under the 'stream' backend extras run BETWEEN multi-step launches:
    # physics_every must be even there (1 auto-promotes to 2 with a
    # warning), and the launch size clamps to a divisor of it.
    physics_every: int = 1

    # DAILY analog (a docstring-only stub in the reference, port.py:586-590;
    # the reference pins solar declination to 0, grey_solar.py:60): drive
    # the solar declination through the year from the state's utc clock,
    # delta = -obliquity * cos(2*pi*(d + 10)/year_days) with d = utc in
    # days — the standard small-eccentricity approximation (exact at the
    # solstices, +-1 day at the equinoxes).  Off by default for reference
    # parity (perpetual equinox).
    seasonal: bool = False
    obliquity: float = 23.44   # [degrees]
    year_days: float = 365.0   # [days]

    # Coriolis: reference computes but disables (dynamics.py:82).
    coriolis: bool = False

    # Dry convective adjustment after the radiation step (Manabe-Strickler
    # 6.5 K/km, enthalpy-conserving).  BEYOND-REFERENCE: the reference has
    # no convection scheme, so its radiative heating eventually
    # destabilizes long physics runs (see physics/convection.py).
    convection: bool = False

    # Bulk-aerodynamic surface evaporation (physics/evaporation.py) after
    # the radiation step.  BEYOND-REFERENCE: declared but left empty in
    # the reference (evaporation.py:5-9).  ``gw0`` seeds the ground-water
    # reservoir [m] (the reference initializes gw = 0, under which the
    # flux is identically zero).
    evaporation: bool = False
    gw0: float = 0.0

    # Large-scale condensation / precipitation (GCM-II CONDSE analog —
    # absent from the reference, whose saturated columns never rain):
    # supersaturation above ``rh_crit`` is removed by an
    # enthalpy-conserving saturation adjustment (latent heating applied)
    # and the condensate rains into the ground-water reservoir, closing
    # the atmosphere+ground total-water budget (physics/condensation.py).
    precipitation: bool = False
    rh_crit: float = 1.0

    # Rayleigh drag e-folding time [s] on the surface layer's momentum
    # (0 disables).  The GCM-II analog (SDRAG / surface friction) is a
    # stub in the reference (port.py:539-599); without ANY momentum sink
    # the radiatively driven circulation grows without bound (KE runaway
    # measured at ~step 6700 of the physics-on flagship run).
    drag_tau: float = 0.0

    # GCM-II FILTER: zonal Shapiro filter on selected prognostics every
    # ``shapiro_every`` steps (0 disables) — a docstring-only stub in the
    # reference (port.py:566-590).  ``shapiro_fields``: 'p' | 't' | 'pt'
    # (the MFILTR=1/2/3 selection); ``shapiro_order`` must be even.
    # ``shapiro_slp``: reduce p to sea level before smoothing (the GCM-II
    # "SEA LEVEL PRESSURE FILTER", port.py:571) — identical over flat
    # terrain, a no-op for terrain-balanced p over topography.  None
    # (default) = auto: on over terrain (topography != 'flat'), off flat.
    shapiro_every: int = 0
    shapiro_order: int = 8
    shapiro_fields: str = "p"
    shapiro_slp: Optional[bool] = None

    # Radiation parameters of basic_grey_radiation (no_limits_2_5d.py:69)
    t_lw: float = 0.1
    t_sw: float = 0.9
    albedo: float = 0.3
    # LW scheme: 'grey' (the reference's basic_grey_radiation) or '4band'
    # (four-band LW with the MITgcm/aim absorptivities the reference
    # records for a future scheme, no_limits_2_5d.py:241-248; t_lw is
    # ignored there — band transmittances come from the aim constants)
    radiation: str = "grey"

    # Numerics
    dtype: str = "float32"
    # 'fft' | 'matmul' | 'dft' polar filter implementation (ignored by the
    # 'mega' backend, whose filter is fused into the kernel)
    polar_filter: str = "fft"
    # Stencil backend for the 2.5D core:
    #   'xla'   — jnp.roll stencils (always available, any grid/dtype)
    #   'fused' — fused Pallas half-step kernel, filter via polar_filter
    #   'mega'  — one Pallas kernel per half step with the polar filter
    #             fused in-VMEM (f32, grid 8|H and 128|W)
    #   'mega4' — the whole Matsuno step in ONE kernel with the
    #             band-limited in-VMEM DFT filter (same grid constraints
    #             as 'mega')
    #   'stream' — the streaming multi-step kernel: ``stream_steps``
    #             whole Matsuno steps per launch with manually
    #             double-buffered DMA (fastest).  Physics/drag/Shapiro
    #             run BETWEEN launches at their cadences (physics_every /
    #             shapiro_every must be even; the launch size clamps to a
    #             common divisor); guard/stats granularity coarsens to the
    #             launch size, with the exact blown step recovered by a
    #             per-step replay.  Under a mesh this is the streamed
    #             lat-ring (one ppermute round per launch).
    backend: str = "xla"
    # Pair-interleaved stage pipeline inside the 'stream' kernel (filter
    # MXU co-scheduled with the other block's VPU stages; bitwise-equal
    # numerics, see ops/pallas_stream.py).
    stream_pipeline: bool = False

    # Steps per launch of the 'stream' backend (must be even; guard and
    # stats operate at this granularity there)
    stream_steps: int = 20
    # Tall wide grids (W > 2048 with H > 64): the streaming kernel runs
    # them NATIVELY since round 5 (lon-tiled VPU stages + HBM-staged
    # tables), but its banded DFT-matmul filter is O(W*nb) per row where
    # the v1 pipeline's FFT is O(W log W) — measured at 9x512x4096: v1
    # 28.8 ms/step vs native stream 47.0.  Default False = the driver
    # picks the faster v1 fallback there; True forces the native
    # streaming kernel (e.g. for the lat-ring decomposition's launch
    # structure).
    stream_wide_native: bool = False
    # GCM-II ADVECQ +-0.5*QT horizontal flux clamp on the q advection
    # (reference port_one_d.py:239-258; the reference 2.5D core's own TODO
    # at dynamics.py:218).  Off by default for reference parity.
    q_limiter: bool = False
    # Matmul precision of the mega backends' in-kernel DFT filter:
    # 'high' (split-bf16 fwd+inv, ~1.7e-5 filter err — the default),
    # 'highest' (f32-exact, ~2x the filter MXU), and two RESEARCH-ONLY
    # modes measured unsound for production on v5e (their 1-pass
    # inverse's bf16 residual corrupts polar rows; filter_accuracy.py):
    # 'fwd_high' (split fwd only) and 'default' (1-pass bf16).
    filter_precision: str = "high"
    # Precision-selective banding for the split filter_precision modes:
    # banded chunks whose damping correction stays below this threshold
    # run 1-pass bf16 matmuls instead of the split passes (their residual
    # is <= 2^-9 * tau of the field, on weakly-damped — dynamically
    # stable — wavenumbers).  0 disables (every active chunk split).
    # Default 1/8: MEASURED sound on v5e (scripts/filter_accuracy.py:
    # 10-step flagship drift identical to tau=0 at 4 significant digits
    # for tau up to 0.3) and worth ~0.08 ms/step at 9x512x1024.
    filter_split_tau: float = 0.125

    # Diagnostics cadence: steps per scan chunk when collecting stats
    stats: bool = True

    # Blow-up guard (reference NaN sweep no_limits_2_5d.py:213 + the GCM-II
    # pressure scream PA > 1150 mb, port.py:295-310).  When on, the scan
    # freezes the state at the last good step and reports the step that
    # first went bad instead of integrating garbage to the end.
    guard: bool = False
    guard_p_max: float = 115000.0  # Pa, ptop-less surface pressure
    guard_p_min: float = 0.0
    # CHECKT analog (stub in the reference, port.py:593-599): potential-
    # temperature reasonableness bounds [K]; guard_t_max = 0 disables
    guard_t_max: float = 0.0
    guard_t_min: float = 0.0

    # Checkpointing
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 0  # steps; 0 disables

    # Per-step StepStats as JSON lines (observability.MetricsLogger)
    metrics_path: Optional[str] = None
