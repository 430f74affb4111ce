from .cg import CGResult, cg_solve  # noqa: F401
from .lanczos import LanczosResult, lanczos, lanczos_root, slq_logdet, tridiag_matrices  # noqa: F401
from .mll import BBMMConfig, lattice_inv_quad_logdet, lattice_nlml  # noqa: F401
from .pivoted_cholesky import (  # noqa: F401
    PivotedCholesky,
    pivoted_cholesky,
    woodbury_logdet,
    woodbury_solve,
)
