from .cg import CGResult, cg_solve  # noqa: F401
from .lanczos import (  # noqa: F401
    LanczosResult,
    lanczos,
    lanczos_root,
    logdet_from_cg_tridiag,
    slq_logdet,
    tridiag_matrices,
)
from .mll import BBMMConfig, build_precond, lattice_inv_quad_logdet, lattice_nlml  # noqa: F401
from .pivoted_cholesky import (  # noqa: F401
    PivotedCholesky,
    Preconditioner,
    make_preconditioner,
    pivoted_cholesky,
    pivoted_cholesky_features,
    precond_inv_sqrt,
    precond_solve,
    woodbury_logdet,
    woodbury_solve,
)
