"""2.5D primitive-equation dynamical core (flux form, Arakawa C-grid, sigma).

TPU-native twin of reference ``dynamics.py`` — the production core of the
reference (SURVEY.md section 2 #10).  State layout ``[k, j, i]`` with surface
pressure ``p`` as ``[j, i]``; velocities staggered on the C-grid (u at
i+1/2, v at j+1/2); potential temperature ``t`` and specific humidity ``q``
at cell centers.

Semantics follow reference ``dynamics.py`` exactly (the parity oracle for
BASELINE.md), with two deliberate deviations documented in SURVEY.md
section 7 "quirk policy":

* the Coriolis term — computed but disabled via ``if False`` in the
  reference (``dynamics.py:82-95``) — is available behind ``coriolis=True``;
* the polar filter is injectable (``filter_fn``) so the sharded path can use
  the matmul formulation.

Everything is pure jnp on plain SI arrays; jit/vmap/scan compose with all
functions here.
"""

import functools

import jax.numpy as jnp

from gcmiipy_tpu import constants
from gcmiipy_tpu.ops import polar_filter
from gcmiipy_tpu.ops.stencil import (
    ijm, ijp, imh, imj, iph, ipj, jmh, jph, km, kmh, kp, kph, gradi, gradj,
)
from gcmiipy_tpu.physics import thermo


def calc_pu(p, u):
    """Zonal mass flux pu = u * p interpolated to i+1/2 (reference dynamics.py:15-17)."""
    return u * iph(p)


def calc_pv(p, v):
    """Meridional mass flux pv = v * p at j+1/2 (reference dynamics.py:20-22)."""
    return v * jph(p)


def un_pu(pu, p):
    """Recover u from the zonal mass flux (reference dynamics.py:25-27).

    2D reciprocal + 3D multiply (not a broadcast 3D division): p is (H, W)
    while pu is (L, H, W) — saves L-1 of the L VPU division passes at
    ulp-level deviation; every backend shares this form."""
    return pu * (1.0 / iph(p))


def un_pv(pv, p):
    """Recover v from the meridional mass flux (reference dynamics.py:30-32).
    2D reciprocal + 3D multiply; see :func:`un_pu`."""
    return pv * (1.0 / jph(p))


def _suffix_sum_k(x):
    """sd[k] = sum_{k' >= k} x[k'] — statically unrolled over the <= 20
    sigma layers (identical summation order to cumsum-of-reversed; unrolled
    because Mosaic has no `rev`/`cumsum` lowering and L is tiny)."""
    L = x.shape[0]
    ys = [None] * L
    acc = x[L - 1]
    ys[L - 1] = acc
    for k in range(L - 2, -1, -1):
        acc = acc + x[k]
        ys[k] = acc
    return jnp.stack(ys, axis=0)


def _prefix_sum_k(x):
    """Cumulative sum over the layer axis, statically unrolled."""
    L = x.shape[0]
    ys = [x[0]]
    for k in range(1, L):
        ys.append(ys[-1] + x[k])
    return jnp.stack(ys, axis=0)


def aflux(pu, pv, geom):
    """Mass convergence -> surface-pressure tendency and sigma-dot
    (reference dynamics.py:35-46).

    Returns (pit, sd): ``pit`` is the column-integrated convergence (the
    surface pressure tendency), ``sd`` the vertical sigma mass flux at layer
    bottoms with sd[0] (surface) pinned to zero.
    """
    # divisions by static geometry become reciprocal multiplies: TPU f32
    # division is a multi-pass VPU op, and these reciprocals are O(J)-sized
    # (vs the O(L*J*I) fields they divide) — same numerics to 1 ulp
    rdx_j = 1.0 / jnp.asarray(geom.dx_j, pu.dtype)
    rdy = 1.0 / jnp.asarray(geom.dy, pu.dtype)
    dsig = jnp.asarray(geom.dsig, pu.dtype)
    sigb = jnp.asarray(geom.sigb, pu.dtype)

    conv = ((pu - imj(pu)) * rdx_j + (pv - ijm(pv)) * rdy) * dsig
    pit = jnp.sum(conv, axis=0)

    # reverse cumulative sum over k: sd[k] = sum_{k' >= k} conv[k']
    sd = _suffix_sum_k(conv)
    sd = sd - pit * sigb
    # surface boundary condition (dynamics.py:44)
    sd = jnp.concatenate([jnp.zeros_like(sd[:1]), sd[1:]], axis=0)
    return pit, sd


def advec_sig(sd, q, geom):
    """Vertical (sigma) advection tendency of ``q`` (reference dynamics.py:49-53)."""
    rdsig = 1.0 / jnp.asarray(geom.dsig, q.dtype)
    flux = kmh(q) * sd
    dq = (flux - kp(flux)) * rdsig
    return -dq


def advec_m_pu(p, u, v, pu, pv, geom, coriolis=False):
    """Horizontal momentum-flux advection tendencies (dut, dvt)
    (reference dynamics.py:55-108).

    ``coriolis=True`` enables the term the reference computes but disables
    (``dynamics.py:82-95``).
    """
    rdx_j = 1.0 / jnp.asarray(geom.dx_j, u.dtype)
    rdx_h = 1.0 / jnp.asarray(geom.dx_h, u.dtype)
    rdy = 1.0 / jnp.asarray(geom.dy, u.dtype)

    puum = imh(u) * imh(pu)
    puup = ipj(puum)

    puvp = iph(pv) * jph(u)
    puvm = ijm(puvp)

    pvvm = jmh(v) * jmh(pv)
    pvvp = ijp(pvvm)
    pvup = iph(v) * jph(pu)
    pvum = imj(pvup)

    if coriolis:
        pu_at_pv = imh(jph(pu))
        pv_at_pu = iph(jmh(pv))
        w = 2 * constants.earth_omega  # 2 * (2 pi / day) (dynamics.py:87-89)
        lat = jnp.asarray(geom.lat, u.dtype)
        cp_at_u = jnp.sin(lat) * w
        cp_at_v = jnp.sin(jph(lat)) * w
        coriolis_u = cp_at_u * -pv_at_pu
        coriolis_v = cp_at_v * pu_at_pv
    else:
        coriolis_u = 0.0
        coriolis_v = 0.0

    dut = (puum - puup) * rdx_j + (puvm - puvp) * rdy + coriolis_u
    dvt = (pvvm - pvvp) * rdy + (pvum - pvup) * rdx_h + coriolis_v
    return dut, dvt


def compute_geopotential(p, t, geom):
    """Layer geopotential via the GISS Cp*thbar*(p^k_dn - p^k_up) ladder
    (reference dynamics.py:111-143, the returned "theirs" form).

    The base level folds the column sums of spa*dsig and sigt*stp plus the
    surface geopotential (``dynamics.py:126-135``).
    """
    sig = jnp.asarray(geom.sig, t.dtype)
    dsig = jnp.asarray(geom.dsig, t.dtype)
    sigt = jnp.asarray(geom.sigt, t.dtype)
    ptop = jnp.asarray(geom.ptop, t.dtype)
    heightmap = jnp.asarray(geom.heightmap, t.dtype)

    tp = p * sig + ptop
    tt = thermo.to_true_temp(t, tp)
    rho = tp / (constants.Rd * tt)

    sp = sig * p
    spa = sp / rho
    s1 = spa * dsig

    pkdn = ((sig * p + ptop) / constants.P0) ** constants.kappa
    pkup = kp(pkdn)
    stp = constants.Cp * kph(t) * (pkdn - pkup)
    s2 = sigt * stp
    base = jnp.sum(s1 - s2, axis=0) + heightmap * constants.G
    stp_n = jnp.concatenate([base[None], km(stp)[1:]], axis=0)
    return _prefix_sum_k(stp_n)


def compute_geopotential_hydrostatic(p, t, geom):
    """Alternative hydrostatic-cumsum geopotential (the reference's "mine"
    form, ``dynamics.py:117-119``): midpoint of each layer's geometric
    thickness above the surface, times g."""
    sig = jnp.asarray(geom.sig, t.dtype)
    dsig = jnp.asarray(geom.dsig, t.dtype)
    ptop = jnp.asarray(geom.ptop, t.dtype)
    heightmap = jnp.asarray(geom.heightmap, t.dtype)

    tp = p * sig + ptop
    tt = thermo.to_true_temp(t, tp)
    rho = tp / (constants.Rd * tt)
    dp = p * dsig
    depth = dp / (rho * constants.G)
    phi = heightmap + jnp.cumsum(depth, axis=0) - depth / 2
    return phi * constants.G


def pgf(p, t, geom):
    """Pressure-gradient force terms (pgfu, pgfv, phiu, phiv)
    (reference dynamics.py:147-171).

    The geopotential ladder is inlined so the thermodynamic subexpressions
    (tp, p^kappa, tt, rho) are computed ONCE: the reference (and
    :func:`compute_geopotential`) recompute them, and ``(tp/P0)^kappa`` is
    the same quantity as the ladder's ``pkdn``, so ``tt = t * pk`` replaces
    a second 3D ``pow`` — on the TPU VPU the transcendentals are the
    expensive part of this function.  Deviation from the reference is at
    float-rounding level (t*pk vs t/(P0/tp)^kappa).
    """
    sig = jnp.asarray(geom.sig, t.dtype)
    dsig = jnp.asarray(geom.dsig, t.dtype)
    sigt = jnp.asarray(geom.sigt, t.dtype)
    ptop = jnp.asarray(geom.ptop, t.dtype)
    heightmap = jnp.asarray(geom.heightmap, t.dtype)
    rdx_j = 1.0 / jnp.asarray(geom.dx_j, t.dtype)
    rdy = 1.0 / jnp.asarray(geom.dy, t.dtype)

    tp = p * sig + ptop
    pk = (tp * (1.0 / constants.P0)) ** constants.kappa  # == pkdn (mul: TPU div is multi-pass)
    tt = t * pk
    rho = tp / (constants.Rd * tt)
    sp = sig * p

    # geopotential ladder (dynamics.py:126-135), sharing tp/pk/tt/rho
    spa = sp / rho
    s1 = spa * dsig
    pkup = kp(pk)
    stp = constants.Cp * kph(t) * (pk - pkup)
    s2 = sigt * stp
    base = jnp.sum(s1 - s2, axis=0) + heightmap * constants.G
    stp_n = jnp.concatenate([base[None], km(stp)[1:]], axis=0)
    phi = _prefix_sum_k(stp_n)

    phiu = iph(p) * ((ipj(phi) - phi) * rdx_j)
    phiv = jph(p) * ((ijp(phi) - phi) * rdy)

    pgfu = iph(sp) / iph(rho) * ((ipj(p) - p) * rdx_j)
    pgfv = jph(sp) / jph(rho) * ((ijp(p) - p) * rdy)
    return pgfu, pgfv, phiu, phiv


def advec_t(pu, pv, t, geom):
    """Flux-form horizontal advection of a cell-centered scalar
    (reference dynamics.py:174-181)."""
    rdx_j = 1.0 / jnp.asarray(geom.dx_j, t.dtype)
    rdy = 1.0 / jnp.asarray(geom.dy, t.dtype)
    tpu = pu * iph(t)
    tpv = pv * jph(t)
    return (tpu - imj(tpu)) * rdx_j + (tpv - ijm(tpv)) * rdy


def advec_q_limited(pu, pv, q, qp, dt, geom):
    """Flux-form horizontal advection of ``q`` with the GCM-II ADVECQ
    +-0.5*QT flux clamp (reference ``port_one_d.py:239-258``): the tracer
    mass a face may move in one half step is bounded by half the DONOR
    cell's current tracer mass ``qp = q * p``.  The reference's 2.5D core
    leaves this as a TODO (``dynamics.py:218``); the clamp is horizontal
    only, matching GCM-II's ADVECQ (vertical tracer advection is
    unclamped there too).

    Returns the same tendency quantity as :func:`advec_t` (d(q*p)/dt
    units); with weak winds (no face moving more than half its donor's
    mass) it is EXACTLY advec_t.
    """
    rdx_j = 1.0 / jnp.asarray(geom.dx_j, q.dtype)
    rdy = 1.0 / jnp.asarray(geom.dy, q.dtype)
    half = 0.5 * qp
    # per-face fractional mass moved this step (flux * dt / dx)
    fx = pu * iph(q) * (dt * rdx_j)
    fx = jnp.clip(fx, -ipj(half), half)     # donor i (fx>0) / i+1 (fx<0)
    fy = pv * jph(q) * (dt * rdy)
    fy = jnp.clip(fy, -ijp(half), half)     # donor j (fy>0) / j+1 (fy<0)
    return ((fx - imj(fx)) + (fy - ijm(fy))) * (1.0 / dt)


def half_timestep_parts(p, u, v, t, q, sp, su, sv, st, sq, spu, dt, geom,
                        coriolis=False, q_limiter=False):
    """Everything between the two polar-filter applications of a half step
    (reference dynamics.py:183-227).

    ``spu`` is the already-filtered zonal mass flux.  Returns
    ``(p_n, v_n, t_n, q_n, pu_partial, pg_phi)`` where ``pu_partial`` still
    lacks the filtered force (``pgfu``) and ``pg_phi = pgu + phiu`` is the
    quantity awaiting the second filter.  Isolated so the fused Pallas
    kernel (:mod:`gcmiipy_tpu.ops.pallas_stencil`) and the XLA path share
    one definition; the polar-row v boundary condition is applied by the
    caller (it targets a global row, which a tiled kernel cannot see).
    """
    pu = calc_pu(p, u)
    pv = calc_pv(p, v)
    spv = calc_pv(sp, sv)

    pit, sd = aflux(spu, spv, geom)
    p_n = p - pit * dt

    dut, dvt = advec_m_pu(sp, su, sv, spu, spv, geom, coriolis=coriolis)
    pgu, pgv, phiu, phiv = pgf(sp, st, geom)
    dus = advec_sig(iph(sd), su, geom)
    dvs = advec_sig(jph(sd), sv, geom)

    pu_partial = pu - (dut + dus) * dt
    pv_n = pv - (dvt + dvs + phiv + pgv) * dt
    v_n = un_pv(pv_n, p_n)

    rp_n = 1.0 / p_n
    t_n = (t * p - (advec_t(spu, spv, st, geom) + advec_sig(sd, st, geom)) * dt) * rp_n
    adv_q = (advec_q_limited(spu, spv, sq, q * p, dt, geom) if q_limiter
             else advec_t(spu, spv, sq, geom))
    q_n = (q * p - (adv_q + advec_sig(sd, sq, geom)) * dt) * rp_n

    return p_n, v_n, t_n, q_n, pu_partial, pgu + phiu


def pgf_forces(sp, su, st, geom):
    """The two filter-bound quantities of a half step, plus the meridional
    force term.

    Both polar-filter inputs of the reference half step — the zonal mass
    flux (``dynamics.py:189``) and the zonal PGF+geopotential force
    (``dynamics.py:202``) — depend only on the *evaluated* state
    ``(sp, su, st)``, never on each other or on the rest of the tendency
    assembly.  Hoisting them up front lets one batched filter call serve
    the whole half step (see :func:`half_timestep_v2`).

    Returns ``(spu_raw, pg_phi, pg_phiv)``: unfiltered zonal mass flux,
    ``pgu + phiu`` (awaiting the filter), and ``pgv + phiv`` (used as-is).
    """
    pgu, pgv, phiu, phiv = pgf(sp, st, geom)
    return calc_pu(sp, su), pgu + phiu, pgv + phiv


def half_timestep_rest(p, u, v, t, q, sp, su, sv, st, sq, spu, dt, geom,
                       coriolis=False, q_limiter=False):
    """Half-step tendency assembly minus the PGF terms (which
    :func:`pgf_forces` provides).

    ``spu`` is the already-filtered zonal mass flux.  Returns
    ``(p_n, pu_partial, pv_partial, t_n, q_n)`` where the momentum fluxes
    still lack the force terms: the caller finishes with
    ``u_n = (pu_partial - pgfu*dt) / iph(p_n)`` and
    ``v_n = (pv_partial - pg_phiv*dt) / jph(p_n)``.  Same expressions as
    :func:`half_timestep_parts` up to float-add reassociation of the
    pv force sum (documented rounding-level deviation).
    """
    pu = calc_pu(p, u)
    pv = calc_pv(p, v)
    spv = calc_pv(sp, sv)

    pit, sd = aflux(spu, spv, geom)
    p_n = p - pit * dt

    dut, dvt = advec_m_pu(sp, su, sv, spu, spv, geom, coriolis=coriolis)
    dus = advec_sig(iph(sd), su, geom)
    dvs = advec_sig(jph(sd), sv, geom)

    pu_partial = pu - (dut + dus) * dt
    pv_partial = pv - (dvt + dvs) * dt

    rp_n = 1.0 / p_n
    t_n = (t * p - (advec_t(spu, spv, st, geom) + advec_sig(sd, st, geom)) * dt) * rp_n
    adv_q = (advec_q_limited(spu, spv, sq, q * p, dt, geom) if q_limiter
             else advec_t(spu, spv, sq, geom))
    q_n = (q * p - (adv_q + advec_sig(sd, sq, geom)) * dt) * rp_n

    return p_n, pu_partial, pv_partial, t_n, q_n


def half_timestep_v2(p, u, v, t, q, sp, su, sv, st, sq, dt, geom,
                     filter_fn=None, coriolis=False, q_limiter=False):
    """Half step with ONE batched polar-filter call (pgf-first pipeline).

    Numerically the same half step as :func:`half_timestep` (reference
    dynamics.py:183-227) — the two filter inputs are independent of the
    rest of the assembly, so they stack into a single (2L, H, W) filter
    application.  This is the XLA twin of the fused v2 Pallas pipeline
    (:func:`gcmiipy_tpu.dynamics.fused.make_fused_matsuno_padded_v2`).
    """
    if filter_fn is None:
        filter_fn = polar_filter.arakawa_1977

    L = u.shape[0]
    spu_raw, pg_phi, pg_phiv = pgf_forces(sp, su, st, geom)
    filt = filter_fn(jnp.concatenate([spu_raw, pg_phi], axis=0), geom)
    spu, pgfu = filt[:L], filt[L:]

    p_n, pu_partial, pv_partial, t_n, q_n = half_timestep_rest(
        p, u, v, t, q, sp, su, sv, st, sq, spu, dt, geom, coriolis=coriolis,
        q_limiter=q_limiter)

    u_n = (pu_partial - pgfu * dt) * (1.0 / iph(p_n))
    v_n = (pv_partial - pg_phiv * dt) * (1.0 / jph(p_n))
    v_n = v_n.at[:, -1, :].set(0.0)  # polar wall (dynamics.py:222)
    return p_n, u_n, v_n, t_n, q_n


def half_timestep(p, u, v, t, q, sp, su, sv, st, sq, dt, geom,
                  filter_fn=None, coriolis=False, q_limiter=False):
    """One forward(-backward) half step of the Matsuno scheme
    (reference dynamics.py:183-227).

    (p,u,v,t,q) is the base state being advanced; (sp,su,...) the state the
    tendencies are evaluated at (identical for the predictor, the starred
    state for the corrector).
    """
    if filter_fn is None:
        filter_fn = polar_filter.arakawa_1977

    # filter the zonal mass flux (dynamics.py:189)
    spu = filter_fn(calc_pu(sp, su), geom)

    p_n, v_n, t_n, q_n, pu_partial, pg_phi = half_timestep_parts(
        p, u, v, t, q, sp, su, sv, st, sq, spu, dt, geom, coriolis=coriolis,
        q_limiter=q_limiter)

    # filter the zonal pressure-gradient + geopotential force (dynamics.py:202)
    pgfu = filter_fn(pg_phi, geom)

    pu_n = pu_partial - pgfu * dt
    u_n = un_pu(pu_n, p_n)

    # southern-row wall: kill v on the last latitude row (dynamics.py:222)
    v_n = v_n.at[:, -1, :].set(0.0)
    return p_n, u_n, v_n, t_n, q_n


def matsuno_timestep(p, u, v, t, q, dt, geom, boundary_conditions=None,
                     filter_fn=None, coriolis=False, q_limiter=False):
    """Full Matsuno (forward-backward predictor-corrector) step
    (reference dynamics.py:230-237)."""
    step = functools.partial(half_timestep, dt=dt, geom=geom,
                             filter_fn=filter_fn, coriolis=coriolis,
                             q_limiter=q_limiter)
    sp, su, sv, st, sq = step(p, u, v, t, q, p, u, v, t, q)
    if boundary_conditions:
        sp, su, sv, st, sq = boundary_conditions(sp, su, sv, st, sq, dt, geom)
    op, ou, ov, ot, oq = step(p, u, v, t, q, sp, su, sv, st, sq)
    if boundary_conditions:
        op, ou, ov, ot, oq = boundary_conditions(op, ou, ov, ot, oq, dt, geom)
    return op, ou, ov, ot, oq
