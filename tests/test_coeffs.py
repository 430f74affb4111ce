"""Coefficient-search parity tests (reference: bilateral_kernel.py:14-56)."""

import numpy as np

from simplex_gp_tpu.ops import coeffs as C
from simplex_gp_tpu.ops import kernels as K


def test_rbf_coeffs_shape_and_normalization():
    for order in (1, 2, 3):
        dk = K.rbf_kernel(order)
        taps = np.asarray(dk.coeffs)
        assert taps.shape == (2 * order + 1,)
        assert taps[order] == 1.0  # center-normalized
        np.testing.assert_allclose(taps, taps[::-1], rtol=1e-6)  # symmetric
        assert np.all(np.diff(taps[: order + 1]) > 0)  # increasing toward center


def test_coverage_diff_monotone_crossing():
    # The binary-search objective must cross zero exactly once in the bounds.
    n = 10**4
    x = np.linspace(-30, 30, n)
    fn = np.exp(-(x**2))
    w = 2 * np.pi * np.fft.fftfreq(n, 60 / n)
    fftv = np.absolute(np.fft.fft(fn) / (2 * np.pi * np.sqrt(n)))
    lo = C.coverage_diff(0.1, 2, x, w, fn, fftv)
    hi = C.coverage_diff(5.0, 2, x, w, fn, fftv)
    assert lo < 0 < hi


def test_matern_coeffs_positive_and_deriv_sign():
    dk = K.matern_kernel(nu=1.5, order=3)
    assert np.all(np.asarray(dk.coeffs) > 0)
    # dk/d(d^2) at 0 is -3/2 for nu=1.5 (closed form)
    np.testing.assert_allclose(dk.dk0, -1.5, rtol=1e-6)
    dkr = K.rbf_kernel(2)
    np.testing.assert_allclose(dkr.dk0, -1.0, rtol=1e-6)


def test_tap_variance_matches_dense_moment():
    taps = np.array([0.25, 1.0, 0.25])
    # mean = 1, E[i^2] = (0*.25 + 1 + 4*.25)/1.5 = 4/3 -> var = 1/3
    np.testing.assert_allclose(C.tap_variance(taps), 1.0 / 3.0, rtol=1e-12)


def test_discretized_kernel_is_hashable_static_arg():
    dk = K.rbf_kernel(1)
    hash(dk)  # must not raise: used as a closed-over static in jit
    assert dk is K.rbf_kernel(1)  # cached
