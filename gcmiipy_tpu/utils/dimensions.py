"""Minimal dimension-tag twin of the reference's pint layer (test-side).

The reference uses pint on every operand as a de-facto type system
(reference ``constants.py:5``, and its unit-dimension tests,
``test_primitive_1d.py:84-175``).  pint cannot trace under ``jit`` (and is
not installed in this environment), so the TPU build keeps all compute on
plain SI arrays; per SURVEY.md section 5.2 the dimensional safety net moves
to the tests: this module provides a ~150-line dimension-tagged ndarray
wrapper that the NumPy oracle (:mod:`gcmiipy_tpu.oracle.numpy_ref`) runs on
UNCHANGED via the ``__array_ufunc__`` / ``__array_function__`` protocols.

``tests/test_dimensions.py`` pushes dimension-tagged state through the full
oracle Matsuno step and asserts every output carries its physical
dimension — the same end-to-end dimensional audit pint performs on every
reference run, executed once per test run instead of per call.

Dimensions are exponent 4-vectors over (m, kg, s, K).  Addition demands
equal dimensions; multiplication adds exponents; non-integer powers demand
dimensionless bases (the ``(P0/tp) ** kappa`` pattern).  Anything not
covered raises rather than guessing — a missing rule is a test failure,
never a silent pass-through.
"""

import numbers

import numpy as np

# exponent vectors over (m, kg, s, K)
DIMENSIONLESS = (0, 0, 0, 0)
M = (1, 0, 0, 0)
KG = (0, 1, 0, 0)
S = (0, 0, 1, 0)
K = (0, 0, 0, 1)


def _combine(a, b, sign=1):
    return tuple(x + sign * y for x, y in zip(a, b))


def _scale(a, k):
    out = tuple(x * k for x in a)
    for x in out:
        if abs(x - round(x)) < 1e-9:
            continue
        raise DimensionError(f"non-integer dimension exponent in {out}")
    return tuple(int(round(x)) for x in out)


def fmt(dim):
    """Render an exponent vector like 'm^1 kg^1 s^-2'."""
    names = ("m", "kg", "s", "K")
    parts = [f"{n}^{e}" for n, e in zip(names, dim) if e]
    return " ".join(parts) if parts else "dimensionless"


# derived dimensions used by the tests
PA = _combine(KG, _combine(M, _scale(S, 2)), sign=-1)   # kg m^-1 s^-2
M_PER_S = _combine(M, S, sign=-1)
M2_PER_S2 = _combine(_scale(M, 2), _scale(S, 2), sign=-1)
J_PER_KG_K = _combine(M2_PER_S2, K, sign=-1)            # R_d, C_p
M_PER_S2 = _combine(M, _scale(S, 2), sign=-1)           # g
KG_PER_M3 = _combine(KG, _scale(M, 3), sign=-1)


class DimensionError(TypeError):
    """Raised when an operation mixes incompatible dimensions."""


def dim_of(x):
    return x.dim if isinstance(x, Q) else DIMENSIONLESS


def mag(x):
    return x.mag if isinstance(x, Q) else x


def _require(cond, msg):
    if not cond:
        raise DimensionError(msg)


class Q:
    """An ndarray (or scalar) tagged with a physical dimension.

    Thin on purpose: it implements exactly the operations the oracle and
    the physics twins use, and raises on everything else.
    """

    __array_priority__ = 1000  # ndarray defers binary ops to Q

    def __init__(self, mag, dim=DIMENSIONLESS):
        self.mag = np.asarray(mag) if not np.isscalar(mag) else mag
        self.dim = tuple(dim)

    # -- introspection ----------------------------------------------------
    def __repr__(self):
        return f"Q({self.mag!r}, {fmt(self.dim)})"

    @property
    def shape(self):
        return np.shape(self.mag)

    @property
    def ndim(self):
        return np.ndim(self.mag)

    def __len__(self):
        return len(self.mag)

    # -- indexing ---------------------------------------------------------
    def __getitem__(self, idx):
        return Q(np.asarray(self.mag)[idx], self.dim)

    def __setitem__(self, idx, value):
        if isinstance(value, Q):
            _require(value.dim == self.dim,
                     f"cannot assign {fmt(value.dim)} into {fmt(self.dim)}")
            value = value.mag
        else:
            # bare zeros are dimension-neutral (the oracle's `sd[0] = 0.0`)
            _require(np.all(np.asarray(value) == 0),
                     "only zero may be assigned without a dimension")
        np.asarray(self.mag)[idx] = value

    # -- reductions the oracle calls as methods ---------------------------
    def sum(self, axis=None, **kw):
        return Q(np.asarray(self.mag).sum(axis=axis, **kw), self.dim)

    def astype(self, dtype):
        return Q(np.asarray(self.mag).astype(dtype), self.dim)

    # -- arithmetic via the ufunc protocol --------------------------------
    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        if method != "__call__" or kwargs.get("out") is not None:
            return NotImplemented
        dims = [dim_of(x) for x in inputs]
        mags = [mag(x) for x in inputs]

        if ufunc in (np.add, np.subtract, np.maximum, np.minimum,
                     np.fmax, np.fmin):
            _require(dims[0] == dims[1],
                     f"{ufunc.__name__} of {fmt(dims[0])} and {fmt(dims[1])}")
            return Q(ufunc(*mags), dims[0])
        if ufunc is np.multiply:
            return Q(ufunc(*mags), _combine(dims[0], dims[1]))
        if ufunc in (np.true_divide, np.divide):
            return Q(ufunc(*mags), _combine(dims[0], dims[1], sign=-1))
        if ufunc is np.power:
            _require(not isinstance(inputs[1], Q) or dims[1] == DIMENSIONLESS,
                     "exponent must be dimensionless")
            exp = mags[1]
            _require(isinstance(exp, numbers.Number),
                     "exponent must be a scalar")
            if dims[0] == DIMENSIONLESS:
                return Q(ufunc(*mags), DIMENSIONLESS)
            return Q(ufunc(*mags), _scale(dims[0], exp))
        if ufunc is np.sqrt:
            return Q(ufunc(*mags), _scale(dims[0], 0.5))
        if ufunc in (np.negative, np.positive, np.absolute, np.conjugate):
            return Q(ufunc(*mags), dims[0])
        if ufunc in (np.greater, np.greater_equal, np.less, np.less_equal,
                     np.equal, np.not_equal):
            _require(dims[0] == dims[1],
                     f"compare {fmt(dims[0])} with {fmt(dims[1])}")
            return ufunc(*mags)
        if ufunc in (np.exp, np.log, np.sin, np.cos, np.tan, np.arcsin,
                     np.arccos, np.arctan, np.tanh, np.expm1, np.log1p):
            _require(dims[0] == DIMENSIONLESS,
                     f"{ufunc.__name__} needs a dimensionless argument, "
                     f"got {fmt(dims[0])}")
            return Q(ufunc(*mags), DIMENSIONLESS)
        if ufunc is np.isfinite:
            return ufunc(mags[0])
        return NotImplemented

    # -- functions the oracle calls at module level -----------------------
    def __array_function__(self, func, types, args, kwargs):
        if func is np.roll:
            return Q(np.roll(mag(args[0]), *args[1:], **kwargs),
                     dim_of(args[0]))
        if func in (np.cumsum, np.sum, np.zeros_like, np.ones_like,
                    np.ravel, np.transpose, np.reshape, np.squeeze):
            d = dim_of(args[0])
            if func is np.ones_like:
                d = DIMENSIONLESS
            return Q(func(mag(args[0]), *args[1:], **kwargs), d)
        if func in (np.concatenate, np.stack):
            seq = args[0]
            d = dim_of(seq[0])
            for x in seq[1:]:
                _require(dim_of(x) == d,
                         f"{func.__name__} mixes {fmt(d)} / {fmt(dim_of(x))}")
            return Q(func([mag(x) for x in seq], *args[1:], **kwargs), d)
        if func is np.clip:
            x, lo, hi = args[0], args[1], args[2]
            for bound in (lo, hi):
                if bound is not None:
                    _require(dim_of(bound) == dim_of(x),
                             f"clip bounds {fmt(dim_of(bound))} vs "
                             f"{fmt(dim_of(x))}")
            return Q(np.clip(mag(x), mag(lo), mag(hi), **kwargs), dim_of(x))
        if func in (np.fft.rfft, np.fft.irfft, np.fft.fft, np.fft.ifft):
            # a pure spectral transform preserves physical dimension
            return Q(func(mag(args[0]), *args[1:], **kwargs), dim_of(args[0]))
        if func is np.shape:
            return np.shape(mag(args[0]))
        if func is np.allclose or func is np.isclose:
            a, b = args[0], args[1]
            _require(dim_of(a) == dim_of(b),
                     f"{func.__name__} mixes {fmt(dim_of(a))} / "
                     f"{fmt(dim_of(b))}")
            return func(mag(a), mag(b), *args[2:], **kwargs)
        return NotImplemented

    # -- python operators (delegate to ufuncs for one set of rules) -------
    def __add__(self, o):
        return np.add(self, o)

    __radd__ = __add__

    def __sub__(self, o):
        return np.subtract(self, o)

    def __rsub__(self, o):
        return np.subtract(o, self)

    def __mul__(self, o):
        return np.multiply(self, o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        return np.true_divide(self, o)

    def __rtruediv__(self, o):
        return np.true_divide(o, self)

    def __pow__(self, o):
        return np.power(self, o)

    def __neg__(self):
        return np.negative(self)

    def __abs__(self):
        return np.absolute(self)

    def __lt__(self, o):
        return np.less(self, o)

    def __le__(self, o):
        return np.less_equal(self, o)

    def __gt__(self, o):
        return np.greater(self, o)

    def __ge__(self, o):
        return np.greater_equal(self, o)

    # == / != must go through the dimension-checked ufunc path too: the
    # default object-identity fallback would silently answer False for
    # mismatched dimensions instead of raising (round-3 advisor finding).
    def __eq__(self, o):
        if o is None:
            return False
        return np.equal(self, o)

    def __ne__(self, o):
        return np.not_equal(self, o)

    # array-valued __eq__ makes instances unhashable, like ndarray
    __hash__ = None
