"""Fused Pallas kernel parity (interpret mode on CPU).

The compiled-kernel path is exercised on real TPU hardware by bench.py and
the verify drives; here the kernel's block/halo machinery runs in interpret
mode and must reproduce the XLA core to float64 roundoff.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from gcmiipy_tpu.dynamics import core25d, fused
from gcmiipy_tpu.grid import geometry


def _initial(geom, seed=0):
    rng = np.random.default_rng(seed)
    L, H, W = geom.layers, geom.height, geom.width
    p = jnp.asarray(1e5 * (1 + 1e-3 * rng.standard_normal((H, W))))
    u = jnp.asarray(0.5 * rng.standard_normal((L, H, W)))
    v = jnp.asarray(0.5 * rng.standard_normal((L, H, W)))
    from gcmiipy_tpu import constants
    tp = np.asarray(p)[None] * np.asarray(geom.sig) + float(geom.ptop)
    t = jnp.asarray((300 + 5 * rng.standard_normal((L, H, W)))
                    * (constants.P0 / tp) ** constants.kappa)
    q = jnp.asarray(1e-5 * (1 + 0.1 * rng.random((L, H, W))))
    return p, u, v, t, q


def test_fused_matches_core_f64():
    geom = geometry.gen_geometry(16, 128, 3, sig_func=geometry.manabe_sig)
    state_f = _initial(geom)
    state_r = state_f
    step_f = fused.make_fused_matsuno(geom, 300.0, dtype=jnp.float64,
                                      interpret=True)
    for _ in range(2):
        state_f = step_f(*state_f)
        state_r = core25d.matsuno_timestep(*state_r, 300.0, geom)
    for name, a, b in zip("puvtq", state_r, state_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-11, atol=1e-11,
                                   err_msg=f"field {name}")


def test_fused_with_coriolis_and_topography():
    from gcmiipy_tpu.grid import topography
    hm = np.zeros((16, 128))
    hm[4:8, 10:40] = 1500.0
    geom = geometry.gen_geometry(16, 128, 3, sig_func=geometry.manabe_sig,
                                 heightmap=hm)
    state_f = _initial(geom, seed=2)
    state_r = state_f
    step_f = fused.make_fused_matsuno(geom, 300.0, dtype=jnp.float64,
                                      coriolis=True, interpret=True)
    state_f = step_f(*state_f)
    state_r = core25d.matsuno_timestep(*state_r, 300.0, geom, coriolis=True)
    for a, b in zip(state_r, state_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-11, atol=1e-11)


def test_fused_polar_bc_applied():
    geom = geometry.gen_geometry(16, 128, 2)
    p, u, v, t, q = _initial(geom, seed=3)
    step_f = fused.make_fused_matsuno(geom, 100.0, dtype=jnp.float64,
                                      interpret=True)
    _, _, v_n, _, _ = step_f(p, u, v, t, q)
    np.testing.assert_allclose(np.asarray(v_n)[:, -1, :], 0.0, atol=1e-14)


def test_half_timestep_v2_matches_v1():
    """The pgf-first single-filter half step is the same half step."""
    geom = geometry.gen_geometry(16, 128, 3, sig_func=geometry.manabe_sig)
    s = _initial(geom, seed=5)
    a = core25d.half_timestep(*s, *s, 300.0, geom)
    b = core25d.half_timestep_v2(*s, *s, 300.0, geom)
    for name, x, y in zip("puvtq", a, b):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=1e-12, atol=1e-12,
                                   err_msg=f"field {name}")


def test_fused_v2_matches_core_f64():
    from gcmiipy_tpu.ops import pallas_stencil as ps
    geom = geometry.gen_geometry(16, 128, 3, sig_func=geometry.manabe_sig)
    state = _initial(geom, seed=6)
    step_f = fused.make_fused_matsuno_padded_v2(geom, 300.0,
                                                dtype=jnp.float64,
                                                interpret=True)
    state_f = tuple(ps.pad_state(x) for x in state)
    state_r = state
    for _ in range(2):
        state_f = step_f(*state_f)
        state_r = core25d.matsuno_timestep(*state_r, 300.0, geom)
    for name, a, b in zip("puvtq", state_r, state_f):
        np.testing.assert_allclose(np.asarray(ps.core(b)), np.asarray(a),
                                   rtol=1e-11, atol=1e-11,
                                   err_msg=f"field {name}")


def test_fused_v2_coriolis_topography():
    from gcmiipy_tpu.ops import pallas_stencil as ps
    hm = np.zeros((16, 128))
    hm[4:8, 10:40] = 1500.0
    geom = geometry.gen_geometry(16, 128, 3, sig_func=geometry.manabe_sig,
                                 heightmap=hm)
    state = _initial(geom, seed=7)
    step_f = fused.make_fused_matsuno_padded_v2(
        geom, 300.0, dtype=jnp.float64, coriolis=True, interpret=True)
    state_f = step_f(*(ps.pad_state(x) for x in state))
    state_r = core25d.matsuno_timestep(*state, 300.0, geom, coriolis=True)
    for a, b in zip(state_r, state_f):
        np.testing.assert_allclose(np.asarray(ps.core(b)), np.asarray(a),
                                   rtol=1e-11, atol=1e-11)


def test_mega_kernel_matches_core_f64():
    """v3 mega-kernel (in-VMEM DFT filter) vs the XLA core with the DFT
    filter: same linear operator, so f64 interpret agrees to roundoff."""
    from gcmiipy_tpu.ops import pallas_stencil as ps
    from gcmiipy_tpu.ops import polar_filter

    geom = geometry.gen_geometry(16, 128, 3, sig_func=geometry.manabe_sig)
    mats = polar_filter.build_dft_matrices(geom.width, dtype=np.float64)
    filt = lambda q, g: polar_filter.arakawa_1977_dft(
        q, g, mats, precision="highest")
    state = _initial(geom, seed=8)
    step_f = fused.make_fused_matsuno_padded_v3(geom, 300.0,
                                                dtype=jnp.float64,
                                                interpret=True)
    state_f = tuple(ps.pad_rows(x) for x in state)
    state_r = state
    for _ in range(2):
        state_f = step_f(*state_f)
        state_r = core25d.matsuno_timestep(*state_r, 300.0, geom,
                                           filter_fn=filt)
    for name, a, b in zip("puvtq", state_r, state_f):
        np.testing.assert_allclose(np.asarray(ps.core_rows(b)), np.asarray(a),
                                   rtol=1e-9, atol=1e-9,
                                   err_msg=f"field {name}")


def test_mega_kernel_coriolis_topography():
    from gcmiipy_tpu.ops import pallas_stencil as ps
    hm = np.zeros((16, 128))
    hm[4:8, 10:40] = 1500.0
    geom = geometry.gen_geometry(16, 128, 3, sig_func=geometry.manabe_sig,
                                 heightmap=hm)
    state = _initial(geom, seed=9)
    step_f = fused.make_fused_matsuno_padded_v3(
        geom, 300.0, dtype=jnp.float64, coriolis=True, interpret=True)
    state_f = step_f(*(ps.pad_rows(x) for x in state))
    state_r = core25d.matsuno_timestep(*state, 300.0, geom, coriolis=True)
    for name, a, b in zip("puvtq", state_r, state_f):
        np.testing.assert_allclose(np.asarray(ps.core_rows(b)), np.asarray(a),
                                   rtol=1e-9, atol=1e-9,
                                   err_msg=f"field {name}")


@pytest.mark.parametrize("backend", ["mega", "mega4"])
def test_driver_mega_backend(backend):
    """run_model with the mega backends (interpret auto-on for CPU)
    matches the XLA backend tightly when the XLA side uses the same DFT
    filter (both exact in f64 — only float summation order differs)."""
    from gcmiipy_tpu.model import driver
    from gcmiipy_tpu.model.config import ModelConfig

    out_m = driver.run_model(16, 128, 3, 900.0, 3,
                             config=ModelConfig(backend=backend,
                                                dtype="float64"))
    out_x = driver.run_model(16, 128, 3, 900.0, 3,
                             config=ModelConfig(backend="xla",
                                                polar_filter="dft",
                                                dtype="float64"))
    for name, a, b in zip("puvtq", out_x[:5], out_m[:5]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-9,
                                   err_msg=f"field {name}")


def test_wrap_pad_is_periodic():
    from gcmiipy_tpu.ops.pallas_stencil import HALO_J, HALO_X, wrap_pad
    x = jnp.asarray(np.random.default_rng(4).standard_normal((3, 8, 256)))
    p = np.asarray(wrap_pad(x))
    np.testing.assert_array_equal(p[:, :HALO_J, HALO_X:-HALO_X],
                                  np.asarray(x)[:, -HALO_J:, :])
    np.testing.assert_array_equal(p[:, HALO_J:-HALO_J, :HALO_X],
                                  np.asarray(x)[:, :, -HALO_X:])


def test_mega_step_kernel_matches_core_f64():
    """v4 whole-step kernel vs the XLA core with the exact-DFT filter."""
    from gcmiipy_tpu.ops import pallas_stencil as ps
    from gcmiipy_tpu.ops import polar_filter

    geom = geometry.gen_geometry(16, 128, 3, sig_func=geometry.manabe_sig)
    mats = polar_filter.build_dft_matrices(geom.width, dtype=np.float64)
    filt = lambda q, g: polar_filter.arakawa_1977_dft(
        q, g, mats, precision="highest")
    state = _initial(geom, seed=12)
    step_f = fused.make_fused_matsuno_padded_v4(geom, 300.0,
                                                dtype=jnp.float64,
                                                interpret=True)
    state_f = tuple(ps.pad_rows(x) for x in state)
    state_r = state
    for _ in range(2):
        state_f = step_f(*state_f)
        state_r = core25d.matsuno_timestep(*state_r, 300.0, geom,
                                           filter_fn=filt)
    for name, a, b in zip("puvtq", state_r, state_f):
        np.testing.assert_allclose(np.asarray(ps.core_rows(b)),
                                   np.asarray(a), rtol=1e-9, atol=1e-9,
                                   err_msg=f"field {name}")


def test_mega_step_kernel_coriolis_topography():
    from gcmiipy_tpu.ops import pallas_stencil as ps
    hm = np.zeros((16, 128))
    hm[4:8, 10:40] = 1500.0
    geom = geometry.gen_geometry(16, 128, 3, sig_func=geometry.manabe_sig,
                                 heightmap=hm)
    state = _initial(geom, seed=13)
    step_f = fused.make_fused_matsuno_padded_v4(
        geom, 300.0, dtype=jnp.float64, coriolis=True, interpret=True)
    state_f = step_f(*(ps.pad_rows(x) for x in state))
    state_r = core25d.matsuno_timestep(*state, 300.0, geom, coriolis=True)
    for name, a, b in zip("puvtq", state_r, state_f):
        np.testing.assert_allclose(np.asarray(ps.core_rows(b)),
                                   np.asarray(a), rtol=1e-9, atol=1e-9,
                                   err_msg=f"field {name}")


from gcmiipy_tpu.ops.pallas_stencil import FILTER_CHUNK as ps_FILTER_CHUNK


def test_mega_step_banded_matches_full():
    """v4 banded filter (per-block chunked DFT) == unbanded, bit-level in
    f64 interpret mode up to summation order."""
    from gcmiipy_tpu.ops import pallas_stencil as ps

    # taller grid so blocks span identity rows (0 chunks) AND polar rows
    geom = geometry.gen_geometry(64, 128, 3, sig_func=geometry.manabe_sig)
    state = _initial(geom, seed=14)
    kw = dict(dtype=jnp.float64, interpret=True, tile_j=8)
    step_b = fused.make_fused_matsuno_padded_v4(geom, 300.0, band_limit=True,
                                                **kw)
    step_f = fused.make_fused_matsuno_padded_v4(geom, 300.0, band_limit=False,
                                                **kw)
    sb = sf = tuple(ps.pad_rows(x) for x in state)
    for _ in range(2):
        sb, sf = step_b(*sb), step_f(*sf)
    for name, a, b in zip("puvtq", sf, sb):
        np.testing.assert_allclose(np.asarray(ps.core_rows(b)),
                                   np.asarray(ps.core_rows(a)),
                                   rtol=1e-12, atol=1e-12,
                                   err_msg=f"field {name}")


def test_band_chunk_counts_cover_mask():
    """Per-row chunk counts cover every damped wavenumber of the mask."""
    from gcmiipy_tpu.ops import polar_filter as pf

    for H, W in [(64, 128), (24, 36), (512, 1024), (16, 17)]:
        geom = geometry.gen_geometry(H, W, 3)
        _, _, _, _, nb = pf.build_dft_matrices_banded(W, dtype=np.float64)
        mc = pf.banded_correction_mask(geom.polar_mask, nb, dtype=np.float64)
        ch = pf.band_chunk_counts(geom.polar_mask)
        for j in range(H):
            cov = int(ch[j]) * ps_FILTER_CHUNK
            assert (mc[j, cov:] == 0).all(), (H, W, j)
        # equatorial rows need fewer chunks than polar rows (visible once
        # the dampable band W//2 spans multiple chunks)
        if W // 2 > ps_FILTER_CHUNK:
            assert ch.min() < ch.max(), (H, W)


def test_mega_step_fwd_high_close_to_high():
    """fwd_high == high in f64/interpret (splits only engage on f32 TPU)."""
    from gcmiipy_tpu.ops import pallas_stencil as ps

    geom = geometry.gen_geometry(16, 128, 3, sig_func=geometry.manabe_sig)
    state = _initial(geom, seed=15)
    sh = fused.make_fused_matsuno_padded_v4(
        geom, 300.0, dtype=jnp.float64, interpret=True,
        filter_precision="fwd_high")(*(ps.pad_rows(x) for x in state))
    sf = fused.make_fused_matsuno_padded_v4(
        geom, 300.0, dtype=jnp.float64, interpret=True,
        filter_precision="high")(*(ps.pad_rows(x) for x in state))
    for name, a, b in zip("puvtq", sf, sh):
        np.testing.assert_allclose(np.asarray(ps.core_rows(b)),
                                   np.asarray(ps.core_rows(a)),
                                   rtol=1e-12, atol=0,
                                   err_msg=f"field {name}")


def test_mega_step_tile_j_invariance():
    """v4 output must be a pure blocking choice: any tile_j gives the same
    fields (banded trip counts only ever add exact-zero damped-band
    corrections on rows whose mask is 1, so even the filter is row-local)."""
    from gcmiipy_tpu.ops import pallas_stencil as ps

    geom = geometry.gen_geometry(32, 128, 2, sig_func=geometry.manabe_sig)
    state = tuple(ps.pad_rows(x) for x in _initial(geom))
    outs = []
    for tj in (8, 32):
        step = fused.make_fused_matsuno_padded_v4(
            geom, 300.0, dtype=jnp.float64, tile_j=tj, interpret=True)
        s = state
        for _ in range(2):
            s = step(*s)
        outs.append([np.asarray(x) for x in s])
    for name, a, b in zip("puvtq", outs[0], outs[1]):
        np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-12,
                                   err_msg=f"field {name}")


def test_mega_width_capacity_fallback():
    """W > MEGA_MAX_WIDTH cannot fit the in-VMEM DFT filter on hardware
    (measured 172MB at W=2048 vs 128MB VMEM): make_fused_step must warn
    and fall back to the v1 pipeline; the kernel builders must refuse."""
    from gcmiipy_tpu.ops import pallas_stencil as ps

    geom = geometry.gen_geometry(16, 1152, 2, sig_func=geometry.manabe_sig)
    with pytest.warns(UserWarning, match="tops out at width"):
        step = fused.make_fused_step(geom, 300.0, pipeline="mega4",
                                     interpret=False)
    assert callable(step)
    with pytest.raises(ValueError, match="VMEM"):
        ps.make_mega_step_kernel(geom, 300.0, interpret=False)
    with pytest.raises(ValueError, match="VMEM"):
        ps.make_mega_kernel_padded(geom, 300.0, interpret=False)
