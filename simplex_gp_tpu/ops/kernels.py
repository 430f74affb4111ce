"""Stationary kernel functions (of squared distance) and their discretizations.

Each kernel is provided twice: a numpy form (used once, on host, by the
coefficient search in :mod:`coeffs`) and analytic facts needed by the filter
VJP (the derivative of the kernel w.r.t. squared distance at zero).

Behavioral parity target: reference ``bilateral_kernel.py:202-254``
(``rbf``, ``matern``, ``Matern`` autograd Function, ``DiscretizedKernelFN``).
The Matern derivative is written in its closed form (which is finite at
tau=0 for nu >= 1.5), sidestepping the non-differentiable sqrt(d^2) that the
reference handles with a hand-written backward (``bilateral_kernel.py:205-232``).
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from .coeffs import get_coeffs, tap_variance

__all__ = ["DiscretizedKernel", "rbf_kernel", "matern_kernel", "kernel_value_jnp"]


def _rbf(d2: np.ndarray) -> np.ndarray:
    return np.exp(-d2)


def _rbf_deriv(d2: np.ndarray) -> np.ndarray:
    # d/dz exp(-z) = -exp(-z)
    return -np.exp(-d2)


def _matern(d2: np.ndarray, nu: float) -> np.ndarray:
    d = np.sqrt(np.abs(d2))
    exp_component = np.exp(-np.sqrt(2 * nu) * d)
    if nu == 0.5:
        poly = 1.0
    elif nu == 1.5:
        poly = np.sqrt(3) * d + 1.0
    elif nu == 2.5:
        poly = np.sqrt(5) * d + 1.0 + (5.0 / 3.0) * d**2
    else:
        raise NotImplementedError(f"Matern nu={nu} not supported (use 0.5, 1.5, 2.5)")
    return poly * exp_component


def _matern_deriv(d2: np.ndarray, nu: float) -> np.ndarray:
    """d/dz matern(z, nu) evaluated at z = d2 (closed form, finite at 0 for nu>=1.5)."""
    d = np.sqrt(np.abs(d2))
    exp_component = np.exp(-np.sqrt(2 * nu) * d)
    if nu == 1.5:
        poly = -1.5
    elif nu == 2.5:
        poly = -(5.0 / 6.0) * (1.0 + np.sqrt(5) * d)
    else:
        raise NotImplementedError(f"Matern derivative for nu={nu} not supported")
    return poly * exp_component


@dataclasses.dataclass(frozen=True)
class DiscretizedKernel:
    """A stationary kernel discretized to (2*order+1) filter taps.

    Instances are hashable (taps stored as float tuples) so they can be
    closed over / passed as static arguments to jitted functions.

    Attributes:
      name: human-readable kernel name.
      order: filter order r; the blur has 2r+1 taps.
      coeffs: forward filter taps, center-normalized, tuple of 2r+1 floats.
      deriv_coeffs: taps of dk/d(d^2), center-normalized, tuple of 2r+1 floats.
      dk0: dk/d(d^2) at d^2=0 -- the true (signed) scale of the derivative
        kernel, lost by center-normalization.  The filter VJP multiplies the
        derivative-filter output by ``2*dk0``; the reference hardcodes -2
        (exact for RBF where dk0=-1; see bilateral_kernel.py:122).
      variance / deriv_variance: discrete tap variances, used to calibrate
        the lattice scale factors (permutohedral.h:388-389).
    """

    name: str
    order: int
    coeffs: tuple
    deriv_coeffs: tuple
    dk0: float
    variance: float
    deriv_variance: float
    nu: float = 0.0  # Matern smoothness; 0.0 for RBF

    @staticmethod
    def build(name: str, kernel_fn, deriv_fn, order: int, nu: float = 0.0) -> "DiscretizedKernel":
        coeffs = get_coeffs(lambda tau: kernel_fn(tau**2), order)
        deriv_coeffs = get_coeffs(lambda tau: deriv_fn(tau**2), order)
        dk0 = float(deriv_fn(np.zeros(1))[0])
        return DiscretizedKernel(
            name=name,
            order=order,
            coeffs=tuple(float(c) for c in coeffs),
            deriv_coeffs=tuple(float(c) for c in deriv_coeffs),
            dk0=dk0,
            variance=tap_variance(coeffs),
            deriv_variance=tap_variance(deriv_coeffs),
            nu=nu,
        )


@functools.lru_cache(maxsize=None)
def rbf_kernel(order: int = 2) -> DiscretizedKernel:
    """Discretized RBF kernel k(d^2) = exp(-d^2) (reference RBFLattice default order=2)."""
    return DiscretizedKernel.build("rbf", _rbf, _rbf_deriv, order)


@functools.lru_cache(maxsize=None)
def matern_kernel(nu: float = 1.5, order: int = 3) -> DiscretizedKernel:
    """Discretized Matern kernel, nu in {1.5, 2.5} (reference MaternLattice default order=3)."""
    return DiscretizedKernel.build(
        f"matern{nu}",
        lambda d2: _matern(d2, nu),
        lambda d2: _matern_deriv(d2, nu),
        order,
        nu=nu,
    )


def kernel_value_jnp(dk: DiscretizedKernel, d2):
    """Exact (undiscretized) kernel value k(d2) as traced jnp math.

    The same stationary kernels as the reference's ``rbf``/``matern``
    (bilateral_kernel.py:202-245), used for exact kernel rows (pivoted-
    Cholesky preconditioner columns) and dense baselines.
    """
    if dk.name == "rbf":
        return jnp.exp(-d2)
    if dk.name.startswith("matern"):
        nu = dk.nu
        d = jnp.sqrt(jnp.maximum(d2, 1e-30))
        e = jnp.exp(-jnp.sqrt(2.0 * nu) * d)
        if nu == 0.5:
            return e
        if nu == 1.5:
            return (1.0 + jnp.sqrt(3.0) * d) * e
        if nu == 2.5:
            return (1.0 + jnp.sqrt(5.0) * d + (5.0 / 3.0) * d2) * e
    raise ValueError(f"unknown kernel {dk.name!r}")
