"""Stencil-operator correctness: shifted-element identities.

Models the reference's micro-tests (``test_matsumo.py:9-30``) plus
hand-derived gradient checks on delta fields.
"""

import jax.numpy as jnp
import numpy as np

from gcmiipy_tpu.ops import stencil as st


def _field3d():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(3, 4, 5)))


def test_ipj_matches_roll():
    q = _field3d()
    np.testing.assert_array_equal(st.ipj(q), np.roll(q, -1, axis=-1))
    np.testing.assert_array_equal(st.imj(q), np.roll(q, 1, axis=-1))
    np.testing.assert_array_equal(st.ijp(q), np.roll(q, -1, axis=-2))
    np.testing.assert_array_equal(st.ijm(q), np.roll(q, 1, axis=-2))
    np.testing.assert_array_equal(st.kp(q), np.roll(q, -1, axis=-3))
    np.testing.assert_array_equal(st.km(q), np.roll(q, 1, axis=-3))


def test_shift_elementwise():
    # like reference test_matsumo.py:9-19: value moves one cell
    q = jnp.zeros((4, 4)).at[1, 2].set(7.0)
    assert st.ipj(q)[1, 1] == 7.0
    assert st.imj(q)[1, 3] == 7.0
    assert st.ijp(q)[0, 2] == 7.0
    assert st.ijm(q)[2, 2] == 7.0
    assert st.imjp(q)[0, 3] == 7.0


def test_half_point_averages():
    q = _field3d()
    np.testing.assert_allclose(st.iph(q), (q + np.roll(q, -1, -1)) / 2)
    np.testing.assert_allclose(st.jmh(q), (q + np.roll(q, 1, -2)) / 2)
    np.testing.assert_allclose(st.kph(q), (q + np.roll(q, -1, -3)) / 2)


def test_gradients_on_delta():
    # gradient at i+1/2 of a unit spike: +1/dx at i-1h side, -1/dx at i
    dx = 2.0
    q = jnp.zeros((4, 6)).at[2, 3].set(1.0)
    g = st.gradi(q, dx)
    assert g[2, 2] == 0.5   # (q[3] - q[2]) / dx at i=2
    assert g[2, 3] == -0.5
    assert jnp.sum(jnp.abs(g)) == 1.0
    gj = st.gradj(q, dx)
    assert gj[1, 3] == 0.5
    assert gj[2, 3] == -0.5


def test_1d_div_grad_inverse_of_shift():
    q = jnp.asarray(np.random.default_rng(1).normal(size=16))
    dx = 1.0
    # divergence of a constant edge field vanishes
    np.testing.assert_allclose(st.div_1d(jnp.ones(16), dx), np.zeros(16))
    # telescoping: sum of div over periodic domain is 0
    np.testing.assert_allclose(float(jnp.sum(st.div_1d(q, dx))), 0.0, atol=1e-12)
    np.testing.assert_allclose(float(jnp.sum(st.gradh_1d(q, dx))), 0.0, atol=1e-12)
