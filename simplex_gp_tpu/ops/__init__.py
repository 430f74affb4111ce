from . import coeffs, kernels, lattice  # noqa: F401
