"""Arakawa & Lamb 1977 polar zonal low-pass filter.

TPU-native twin of reference ``low_pass.py:41-78``: near the poles, where
lat-lon cells narrow, zonal wavenumber ``n`` is damped by

    smmz(n, j) = 1 - max(0, 1 - 1/(sin(pi n / I) * dy/dx_j))

applied in rFFT space along longitude.  The mask is static per geometry and
precomputed into ``Geom.polar_mask`` (see ``gcmiipy_tpu/grid/geometry.py``).

Two interchangeable implementations:

* :func:`arakawa_1977` — rFFT / mask / irFFT, one-chip path (XLA FFT).
* :func:`arakawa_1977_matmul` + :func:`build_filter_matrices` — the filter is
  a per-latitude real circulant I x I matrix, so filtering is a batched
  matmul.  Exact (same mask), MXU-friendly, and decomposition-friendly: under
  a sharded longitude axis it is an ordinary sharded matmul for which XLA
  inserts the collectives, instead of a global FFT.

The reference's ``irfft`` with default length breaks on odd I
(``low_pass.py:77``); here the inverse length is pinned to I, which is the
exact generalization.  ``avrx`` (reference ``low_pass.py:14-38``) is the
earlier hard-cutoff variant, kept for completeness.
"""

import jax.numpy as jnp
import numpy as np


def arakawa_1977(q, geom):
    """Filter ``q`` ([j,i] or [k,j,i]) along longitude (reference low_pass.py:41-78)."""
    im = q.shape[-1]
    if im == 1:  # (reference low_pass.py:58-59)
        return q
    mask = jnp.asarray(geom.polar_mask, dtype=q.dtype)  # (J, I//2+1)
    f_q = jnp.fft.rfft(q, axis=-1)
    f_q = f_q * mask
    return jnp.fft.irfft(f_q, n=im, axis=-1).astype(q.dtype)


def avrx(q, geom):
    """Hard-cutoff zonal filter, earlier variant (reference low_pass.py:14-38).

    Zeroes every zonal wavenumber whose wavelength ratio exceeds 1/2:
    keeps n where n/I * dy/dx_j <= 1/2.
    """
    im = q.shape[-1]
    if im == 1:
        return q
    freqs = np.fft.rfftfreq(im)                       # n/I
    dx_row = np.asarray(geom.dx_j).reshape(-1)        # (J,)
    ratios = freqs[None, :] / dx_row[:, None] * float(geom.dy)
    mask = jnp.asarray((ratios <= 0.5).astype(np.float64))
    f_q = jnp.fft.rfft(q, axis=-1) * mask.astype(q.dtype)
    return jnp.fft.irfft(f_q, n=im, axis=-1).astype(q.dtype)


def build_filter_matrices(geom, dtype=np.float32):
    """Per-latitude real circulant filter matrices F, shape (J, I, I).

    Row j of the filtered field is ``F[j] @ q[..., j, :]``.  Because the mask
    is real and applied to an rFFT, F is the real circulant whose first row is
    ``irfft(mask[j], n=I)``; column k is that row rolled by k.
    """
    height, width = geom.height, geom.width
    mask = np.asarray(geom.polar_mask, dtype=np.float64)  # (J, I//2+1)
    kernel = np.fft.irfft(mask, n=width, axis=-1)          # (J, I) impulse response
    # Circulant: F[j, a, b] = kernel[j, (a - b) mod I]
    a = np.arange(width)
    idx = (a[:, None] - a[None, :]) % width
    F = kernel[:, idx]                                     # (J, I, I)
    return F.astype(dtype)


def arakawa_1977_matmul(q, filter_matrices):
    """Apply the polar filter as a batched per-row matmul.

    ``q``: [..., J, I]; ``filter_matrices``: (J, I, I) from
    :func:`build_filter_matrices`.  out[..., j, a] = sum_b F[j,a,b] q[..., j, b].
    """
    F = jnp.asarray(filter_matrices, dtype=q.dtype)
    return jnp.einsum('jab,...jb->...ja', F, q,
                      preferred_element_type=q.dtype)


def build_dft_matrices(width, dtype=np.float32):
    """Shared real-DFT factor matrices for the matmul filter.

    The filter irfft(mask * rfft(q)) factors into four matmuls with
    matrices shared across latitude rows (the per-row mask applies
    elementwise between them):

        a = q @ C ; b = q @ S          (forward real DFT, (W, nf))
        y = (a*m) @ Cw + (b*m) @ Sw    (inverse, (nf, W))

    with w_n = 1 for n in {0, W/2} else 2 folding conjugate symmetry.
    MXU-friendly: O(W^2) per row but fully dense matmuls, ~2x faster than
    XLA's TPU FFT at W ~ 1024 and shards trivially.
    """
    nf = width // 2 + 1
    n = np.arange(nf)
    x = np.arange(width)
    ang = 2 * np.pi * np.outer(x, n) / width       # (W, nf)
    C = np.cos(ang)
    S = -np.sin(ang)                               # b_n = -Im F_n
    w = np.full(nf, 2.0)
    w[0] = 1.0
    if width % 2 == 0:
        w[-1] = 1.0
    Cw = (w[:, None] * np.cos(ang).T) / width      # (nf, W)
    Sw = (w[:, None] * -np.sin(ang).T) / width
    return (C.astype(dtype), S.astype(dtype),
            Cw.astype(dtype), Sw.astype(dtype))


def build_dft_matrices_banded(width, dtype=np.float32, chunk=128):
    """Real-DFT factor matrices restricted to the dampable band, columns in
    DESCENDING wavenumber order (n = W//2 ... 1; n = 0 is never damped by
    the Arakawa mask — reference ``low_pass.py:64-71`` — so it is dropped).

    Because damping at row j hits the contiguous band [n_lo(j), W//2] (the
    mask is monotone in sin(pi n / W)), the descending layout turns each
    row's damped band into a PREFIX of the columns.  A kernel can then
    accumulate the filter correction chunk-by-chunk from column 0 and stop
    after ``ceil(band/chunk)`` chunks — equatorial latitudes touch one MXU
    chunk where polar rows need them all.

    Returns ``(C, S, Cw, Sw, nb)``: forward factors (W, nb), inverse
    factors (nb, W), with nb = ceil((W//2)/chunk)*chunk (zero-padded).
    Semantics: ``filtered = q + ((q @ C) * mc) @ Cw + ((q @ S) * mc) @ Sw``
    with ``mc`` from :func:`banded_correction_mask` — identical damping to
    :func:`arakawa_1977` up to float summation order.
    """
    C, S, Cw, Sw = build_dft_matrices(width, dtype=np.float64)
    nf = width // 2 + 1
    rev = np.arange(nf - 1, 0, -1)          # n = W//2, ..., 1
    nb = max(chunk, -(-(nf - 1) // chunk) * chunk)
    Cb = np.zeros((width, nb))
    Sb = np.zeros((width, nb))
    Cwb = np.zeros((nb, width))
    Swb = np.zeros((nb, width))
    Cb[:, :nf - 1] = C[:, rev]
    Sb[:, :nf - 1] = S[:, rev]
    Cwb[:nf - 1] = Cw[rev]
    Swb[:nf - 1] = Sw[rev]
    return (Cb.astype(dtype), Sb.astype(dtype),
            Cwb.astype(dtype), Swb.astype(dtype), nb)


def banded_correction_mask(polar_mask, nb, dtype=np.float32):
    """(J, nb) correction mask ``mc = mask - 1`` in the descending-n banded
    column order of :func:`build_dft_matrices_banded` (zero-padded)."""
    mask = np.asarray(polar_mask, np.float64)
    nf = mask.shape[-1]
    out = np.zeros((mask.shape[0], nb))
    out[:, :nf - 1] = mask[:, :0:-1] - 1.0
    return out.astype(dtype)


def banded_pair_matrices(width, dtype=np.float32, chunk=128):
    """Banded DFT factors with C and S chunk-INTERLEAVED into one matrix
    pair, so a kernel applies both transforms with ONE matmul per chunk.

    Returns ``(CS, CwSw, nb)``: CS is (W, 2*nb) with columns
    ``[C_chunk0 | S_chunk0 | C_chunk1 | S_chunk1 | ...]`` and CwSw the
    matching (2*nb, W) inverse rows.  Filtering row x:
    ``x + ((x @ CS) * mcc) @ CwSw`` with ``mcc`` from
    :func:`banded_correction_mask_pair` — identical to the separate
    C/S form up to float summation order.
    """
    C, S, Cw, Sw, nb = build_dft_matrices_banded(width, dtype=np.float64,
                                                 chunk=chunk)
    nch = nb // chunk
    W = width
    CS = np.stack([C.reshape(W, nch, chunk),
                   S.reshape(W, nch, chunk)], axis=2).reshape(W, 2 * nb)
    CwSw = np.stack([Cw.reshape(nch, chunk, W),
                     Sw.reshape(nch, chunk, W)], axis=1).reshape(2 * nb, W)
    return CS.astype(dtype), CwSw.astype(dtype), nb


def banded_correction_mask_pair(polar_mask, nb, dtype=np.float32, chunk=128):
    """(J, 2*nb) correction mask in the chunk-interleaved layout of
    :func:`banded_pair_matrices` (each chunk's mask duplicated for the
    C and S halves)."""
    mc = banded_correction_mask(polar_mask, nb, dtype=np.float64)
    J = mc.shape[0]
    nch = nb // chunk
    mcc = np.stack([mc.reshape(J, nch, chunk)] * 2,
                   axis=2).reshape(J, 2 * nb)
    return mcc.astype(dtype)


def band_chunk_counts(polar_mask, chunk=128):
    """Per-row number of ``chunk``-wide banded-column chunks that carry any
    damping (i.e. cover the row's damped band in the descending layout)."""
    mask = np.asarray(polar_mask, np.float64)
    nf = mask.shape[-1]
    mc = mask[:, :0:-1] - 1.0               # (J, nf-1), descending n
    damped = mc != 0.0
    # highest damped column index + 1, 0 if none
    band = np.where(damped.any(axis=-1),
                    nf - 1 - np.argmax(damped[:, ::-1], axis=-1), 0)
    return -(-band // chunk).astype(np.int32)


def band_chunk_counts_above(polar_mask, tau, chunk=128):
    """Per-row number of banded chunks whose max damping correction
    ``|mask - 1|`` exceeds ``tau``.

    Because ``|mask-1|`` is monotone non-increasing along the
    descending-n banded columns (damping grows with wavenumber), the
    strong chunks form a PREFIX of the active chunks — the basis of the
    precision-selective filter: chunks above the threshold get the full
    split-bf16 matmuls, the weakly-damped tail runs 1-pass (its bf16
    residual, <= 2^-9 * tau of the field, sits on weakly-damped — i.e.
    dynamically stable — wavenumbers).  ``tau=0`` reproduces
    :func:`band_chunk_counts` exactly.
    """
    mask = np.asarray(polar_mask, np.float64)
    nf = mask.shape[-1]
    mc = np.abs(mask[:, :0:-1] - 1.0)       # (J, nf-1), descending n
    strong = mc > tau
    band = np.where(strong.any(axis=-1),
                    nf - 1 - np.argmax(strong[:, ::-1], axis=-1), 0)
    return -(-band // chunk).astype(np.int32)


def arakawa_1977_dft(q, geom, dft_mats, precision="high",
                     form="correction"):
    """Polar filter via shared-matrix real DFT matmuls (same damping mask
    as :func:`arakawa_1977`).

    ``precision`` matters on TPU: the MXU truncates f32 matmul inputs to
    bf16 by default; "high" (3-pass bf16) recovers ~f32 accuracy at ~1.5x
    the matmul cost.

    ``form="correction"`` computes ``q + irfft((mask-1) rfft(q))`` — the
    identity passes through exactly and matmul error scales with the small
    damped-band correction rather than the whole field (typically >10x
    less error than the direct form at the same precision).  "direct" is
    the plain ``irfft(mask rfft(q))``.
    """
    if q.shape[-1] == 1:
        return q
    prec = precision
    C, S, Cw, Sw = (jnp.asarray(m, q.dtype) for m in dft_mats)
    mask = jnp.asarray(geom.polar_mask, q.dtype)   # (J, nf)
    if form == "correction":
        mask = mask - 1.0
    mm = lambda x, y: jnp.matmul(x, y, precision=prec,
                                 preferred_element_type=q.dtype)
    a = mm(q, C) * mask
    b = mm(q, S) * mask
    out = mm(a, Cw) + mm(b, Sw)
    return q + out if form == "correction" else out
