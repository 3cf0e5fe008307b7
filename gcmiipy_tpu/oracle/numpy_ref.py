"""Pure-NumPy float64 oracle of the 2.5D Matsuno core.

The reference implementation (marthinwurer/gcmiipy) is single-process
NumPy+pint; pint is unavailable here, so this module is the framework's
stand-in oracle: a pint-free NumPy transcription of the same discretization
(reference ``dynamics.py`` + ``low_pass.py:41-78``), written against our
:class:`~gcmiipy_tpu.grid.geometry.Geom`.

It serves two purposes:

* **parity oracle** — tests assert the JAX core matches this to f64
  tolerance after N steps (BASELINE.md correctness target);
* **baseline proxy** — ``bench.py`` times it to estimate the reference's
  single-process NumPy throughput (the reference publishes no numbers,
  SURVEY.md section 6).

Deliberately straightforward NumPy; no vectorization tricks beyond what the
reference itself does.
"""

import numpy as np

from gcmiipy_tpu import constants


def _roll(q, shift, axis):
    return np.roll(q, shift, axis=axis)


def ipj(q):
    return _roll(q, -1, -1)


def imj(q):
    return _roll(q, 1, -1)


def ijp(q):
    return _roll(q, -1, -2)


def ijm(q):
    return _roll(q, 1, -2)


def kp(q):
    return _roll(q, -1, -3)


def km(q):
    return _roll(q, 1, -3)


def iph(q):
    return (q + ipj(q)) / 2


def imh(q):
    return (q + imj(q)) / 2


def jph(q):
    return (q + ijp(q)) / 2


def jmh(q):
    return (q + ijm(q)) / 2


def kph(q):
    return (q + kp(q)) / 2


def kmh(q):
    return (q + km(q)) / 2


def arakawa_1977_np(q, geom):
    """Zonal spectral damping (reference low_pass.py:41-78)."""
    im_ = q.shape[-1]
    if im_ == 1:
        return q
    f_q = np.fft.rfft(q, axis=-1)
    f_q *= geom.polar_mask
    return np.fft.irfft(f_q, n=im_, axis=-1)


def aflux_np(pu, pv, geom):
    conv = ((pu - imj(pu)) / geom.dx_j + (pv - ijm(pv)) / geom.dy) * geom.dsig
    pit = conv.sum(axis=0)
    sd = np.cumsum(conv[::-1], axis=0)[::-1] - pit * geom.sigb
    sd[0] = 0.0
    return pit, sd


def advec_sig_np(sd, q, geom):
    flux = kmh(q) * sd
    return -(flux - kp(flux)) / geom.dsig


def advec_m_pu_np(u, v, pu, pv, geom):
    puum = imh(u) * imh(pu)
    puup = ipj(puum)
    puvp = iph(pv) * jph(u)
    puvm = ijm(puvp)
    pvvm = jmh(v) * jmh(pv)
    pvvp = ijp(pvvm)
    pvup = iph(v) * jph(pu)
    pvum = imj(pvup)
    dut = (puum - puup) / geom.dx_j + (puvm - puvp) / geom.dy
    dvt = (pvvm - pvvp) / geom.dy + (pvum - pvup) / geom.dx_h
    return dut, dvt


def geopotential_np(p, t, geom):
    tp = p * geom.sig + geom.ptop
    tt = t / ((constants.P0 / tp) ** constants.kappa)
    rho = tp / (constants.Rd * tt)
    sp = geom.sig * p
    spa = sp / rho
    s1 = spa * geom.dsig
    pkdn = ((geom.sig * p + geom.ptop) / constants.P0) ** constants.kappa
    pkup = kp(pkdn)
    stp = constants.Cp * kph(t) * (pkdn - pkup)
    s2 = geom.sigt * stp
    stp_n = km(stp)
    stp_n[0] = (s1 - s2).sum(axis=0) + geom.heightmap * constants.G
    return np.cumsum(stp_n, axis=0)


def pgf_np(p, t, geom):
    tp = p * geom.sig + geom.ptop
    tt = t / ((constants.P0 / tp) ** constants.kappa)
    rho = tp / (constants.Rd * tt)
    sp = geom.sig * p
    phi = geopotential_np(p, t, geom)
    phiu = iph(p) * (ipj(phi) - phi) / geom.dx_j
    phiv = jph(p) * (ijp(phi) - phi) / geom.dy
    pgfu = iph(sp) / iph(rho) * (ipj(p) - p) / geom.dx_j
    pgfv = jph(sp) / jph(rho) * (ijp(p) - p) / geom.dy
    return pgfu, pgfv, phiu, phiv


def advec_t_np(pu, pv, t, geom):
    tpu = pu * iph(t)
    tpv = pv * jph(t)
    return (tpu - imj(tpu)) / geom.dx_j + (tpv - ijm(tpv)) / geom.dy


def advec_q_limited_np(pu, pv, q, qp, dt, geom):
    """GCM-II ADVECQ +-0.5*QT clamped horizontal q advection (reference
    port_one_d.py:239-258 generalized to 2D); oracle twin of
    core25d.advec_q_limited."""
    rdx_j = 1.0 / np.asarray(geom.dx_j)
    rdy = 1.0 / float(geom.dy)
    half = 0.5 * qp
    fx = pu * iph(q) * (dt * rdx_j)
    fx = np.clip(fx, -ipj(half), half)
    fy = pv * jph(q) * (dt * rdy)
    fy = np.clip(fy, -ijp(half), half)
    return ((fx - imj(fx)) + (fy - ijm(fy))) / dt


def half_timestep_np(p, u, v, t, q, sp, su, sv, st, sq, dt, geom,
                     q_limiter=False):
    pu = u * iph(p)
    spu = arakawa_1977_np(su * iph(sp), geom)
    pv = v * jph(p)
    spv = sv * jph(sp)

    pit, sd = aflux_np(spu, spv, geom)
    p_n = p - pit * dt

    dut, dvt = advec_m_pu_np(su, sv, spu, spv, geom)
    pgu, pgv, phiu, phiv = pgf_np(sp, st, geom)
    dus = advec_sig_np(iph(sd), su, geom)
    dvs = advec_sig_np(jph(sd), sv, geom)

    pgfu = arakawa_1977_np(pgu + phiu, geom)

    pu_n = pu - (dut + dus + pgfu) * dt
    pv_n = pv - (dvt + dvs + phiv + pgv) * dt

    u_n = pu_n / iph(p_n)
    v_n = pv_n / jph(p_n)

    t_n = (t * p - (advec_t_np(spu, spv, st, geom)
                    + advec_sig_np(sd, st, geom)) * dt) / p_n
    adv_q = (advec_q_limited_np(spu, spv, sq, q * p, dt, geom) if q_limiter
             else advec_t_np(spu, spv, sq, geom))
    q_n = (q * p - (adv_q + advec_sig_np(sd, sq, geom)) * dt) / p_n

    v_n[:, -1, :] = 0.0
    return p_n, u_n, v_n, t_n, q_n


def matsuno_timestep_np(p, u, v, t, q, dt, geom, q_limiter=False):
    """Matsuno predictor-corrector (reference dynamics.py:230-237)."""
    s = half_timestep_np(p, u, v, t, q, p, u, v, t, q, dt, geom,
                         q_limiter=q_limiter)
    return half_timestep_np(p, u, v, t, q, *s, dt, geom,
                            q_limiter=q_limiter)
